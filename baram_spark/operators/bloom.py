"""Rotating bloom filter (I9) + streaming-dedup prefilter integration.

The reference bounds crawler memory with a double-buffered bloom
(``/root/reference/src/storage/dedup.rs:196-330``): an ACTIVE filter
takes inserts, the PREVIOUS generation stays lookup-only, and rotation
(at 80% fill or 1 h age) discards previous ← active ← fresh. Its role in
the 3-tier dedup (dedup.rs:856-970) is the fast-reject: "definitely new"
urls skip the expensive store probe entirely (~90% fewer DB queries per
ARCHITECTURE.md:251-273).

Two classes with distinct contracts:

- :class:`RotatingBloom` is the reference-parity structure (I9):
  bounded memory for a long-lived process, where a rotated-out key is
  allowed to re-probe the authoritative store. Use it where the backing
  store tolerates re-checks (caches, crawler politeness state).
- :class:`CommittedUrlBloom` is the tier the INDEX BUILDER may trust:
  a seeded SUPERSET of the committed urls (``might_contain == False`` ⇒
  definitely not indexed ⇒ the committed-urls anti-join can be skipped).
  It never rotates; outgrowing its sized capacity clears
  ``authoritative`` and the builder falls back to the plain anti-join —
  correctness never depends on the filter. The reference can skip its
  DB probe on a bloom miss only because Postgres enforces uniqueness
  underneath (this engine's no-duplicate invariant has no such
  backstop, hence the stricter contract).

``streaming/ingest.py`` seeds one driver-side filter per stream,
ships it by value into an Arrow-batched membership test, and skips the
anti-join for all-definitely-new micro-batches — the common
forward-crawl case.
"""

from __future__ import annotations

import math
import time

import numpy as np
import pandas as pd  # module-level: pandas_udf type hints resolve here

__all__ = ["RotatingBloom", "CommittedUrlBloom", "membership_udf"]


def membership_udf(bloom: "RotatingBloom"):
    """Arrow-batched ``might_contain`` column function over a broadcast
    (pickled-by-value) filter — the fast-reject tier's Spark surface."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def might(urls: pd.Series) -> pd.Series:
        return pd.Series(bloom.membership(urls.tolist()))

    return might


def _sizes(capacity: int, fp_rate: float) -> tuple[int, int]:
    """Optimal (m bits, k hashes) for the target false-positive rate."""
    m = max(64, int(math.ceil(-capacity * math.log(fp_rate)
                              / (math.log(2) ** 2))))
    k = max(1, int(round(m / capacity * math.log(2))))
    return m, k


class _Bloom:
    __slots__ = ("bits", "m", "k", "count")

    def __init__(self, capacity: int, fp_rate: float):
        self.m, self.k = _sizes(capacity, fp_rate)
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)
        self.count = 0

    def _positions(self, key: str) -> np.ndarray:
        # double hashing (Kirsch–Mitzenmacher): two independent 64-bit
        # hashes generate all k probe positions
        import hashlib

        d = hashlib.blake2b(key.encode("utf-8"), digest_size=16).digest()
        h1 = np.uint64(int.from_bytes(d[:8], "little"))
        h2 = np.uint64(int.from_bytes(d[8:], "little") | 1)
        i = np.arange(self.k, dtype=np.uint64)
        return (h1 + i * h2) % np.uint64(self.m)  # wrapping uint64 math

    def add(self, key: str) -> None:
        pos = self._positions(key)
        # two probes can land in the SAME word: plain fancy-index |=
        # applies only one of them — use the unbuffered ufunc form
        np.bitwise_or.at(
            self.bits, pos // np.uint64(64),
            np.uint64(1) << (pos % np.uint64(64)),
        )
        self.count += 1

    def might_contain(self, key: str) -> bool:
        pos = self._positions(key)
        word = self.bits[pos // np.uint64(64)]
        return bool(np.all(
            (word >> (pos % np.uint64(64))) & np.uint64(1)
        ))

    def membership_batch(self, keys) -> np.ndarray:
        """Vectorized batch lookup: one blake2b per key (unavoidable for
        string hashing) but ALL probe-position math and bit gathering in
        a single (n, k) numpy pass — the Arrow-UDF hot path pays no
        per-key numpy temporaries."""
        import hashlib

        n = len(keys)
        if n == 0:
            return np.zeros(0, dtype=bool)
        h1 = np.empty(n, dtype=np.uint64)
        h2 = np.empty(n, dtype=np.uint64)
        for i, k in enumerate(keys):
            d = hashlib.blake2b(k.encode("utf-8"), digest_size=16).digest()
            h1[i] = int.from_bytes(d[:8], "little")
            h2[i] = int.from_bytes(d[8:], "little") | 1
        i = np.arange(self.k, dtype=np.uint64)
        pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.m)
        words = self.bits[pos // np.uint64(64)]
        hit = (words >> (pos % np.uint64(64))) & np.uint64(1)
        return hit.all(axis=1)


class RotatingBloom:
    """Double-buffered bloom with the reference's rotation policy
    (dedup.rs defaults: 50k/generation, 1% fp, rotate at 80% fill or
    1 h age). Lookups consult active + previous; inserts go to active.

    Picklable/broadcastable: state is two numpy bit arrays."""

    def __init__(self, capacity: int = 50_000, fp_rate: float = 0.01,
                 rotation_threshold: float = 0.8,
                 max_age_seconds: float = 3600.0):
        self.capacity = capacity
        self.fp_rate = fp_rate
        self.rotation_threshold = rotation_threshold
        self.max_age_seconds = max_age_seconds
        self.active = _Bloom(capacity, fp_rate)
        self.previous: _Bloom | None = None
        self.active_created_at = time.monotonic()
        self.rotation_count = 0

    def _maybe_rotate(self) -> None:
        full = self.active.count >= self.capacity * self.rotation_threshold
        old = (time.monotonic() - self.active_created_at
               >= self.max_age_seconds)
        if full or old:
            self.previous = self.active
            self.active = _Bloom(self.capacity, self.fp_rate)
            self.active_created_at = time.monotonic()
            self.rotation_count += 1

    def add(self, key: str) -> None:
        self._maybe_rotate()
        self.active.add(key)

    def add_many(self, keys) -> None:
        for k in keys:
            self.add(k)

    def might_contain(self, key: str) -> bool:
        if self.active.might_contain(key):
            return True
        return self.previous is not None and self.previous.might_contain(key)

    def membership(self, keys) -> np.ndarray:
        """Batch lookup (the Arrow-UDF hot path): one vectorized pass per
        live filter generation."""
        keys = list(keys)
        out = self.active.membership_batch(keys)
        if self.previous is not None:
            np.logical_or(out, self.previous.membership_batch(keys),
                          out=out)
        return out


class CommittedUrlBloom:
    """A SOUND dedup fast-reject tier for the index builder.

    The reference can treat "not in bloom" as definitely-new because its
    Postgres layer has a unique constraint underneath (dedup.rs:856-970 —
    a bloom-forgotten url at worst re-probes the DB). This engine's
    no-duplicate-url invariant has no such backstop, so a prefilter bloom
    must be a SUPERSET of the committed urls to be allowed to skip the
    anti-join. This class keeps that contract explicit:

    - :meth:`seed` builds the filter FROM the committed urls with one
      distributed pass (per-partition bit arrays OR-reduced — urls never
      collect to the driver), sized to the corpus with headroom;
    - inserts past the sized capacity clear ``authoritative`` — the
      builder then ignores the filter and falls back to the plain
      anti-join (correctness never depends on the bloom).

    Driver-resident: ~1.2 MB per million urls at 1% fp. Suits streams up
    to ~10^8 committed urls; beyond that, the anti-join itself (with
    Spark's runtime bloom-filter join) IS the fast-reject tier."""

    def __init__(self, capacity: int = 50_000, fp_rate: float = 0.01):
        self.capacity = capacity
        self.fp_rate = fp_rate
        self.bloom = _Bloom(capacity, fp_rate)
        self.authoritative = True

    @classmethod
    def seed(cls, df, col: str = "url", fp_rate: float = 0.01,
             headroom: float = 4.0, min_capacity: int = 50_000
             ) -> "CommittedUrlBloom":
        """Build from a url DataFrame in ONE distributed pass."""
        n = df.count()
        inst = cls(max(min_capacity, int(n * headroom)), fp_rate)
        inst.add_df(df, col=col, n=n)
        return inst

    def add_df(self, df, col: str = "url", n: int | None = None) -> None:
        """Feed a whole url relation WITHOUT collecting it: per-partition
        (partial filter, count) pairs are OR/sum-reduced on executors, so
        the driver receives exactly one fixed-size bit array + a count in
        ONE pass over the relation (the streaming-ingest feed path — a
        micro-batch's urls must all enter the filter to keep
        supersetness, but never via a driver round-trip that scales with
        batch size). ``n``, when the caller already counted, just skips
        the pass entirely for a known-empty relation."""
        if n == 0:
            return
        cap, fp = self.capacity, self.fp_rate

        def part_bits(rows):
            local = _Bloom(cap, fp)
            c = 0
            for r in rows:
                local.add(r[0])
                c += 1
            yield local.bits, c

        # treeAggregate with a zero value: empty relations reduce to the
        # zero pair instead of raising (treeReduce would)
        zero = (np.zeros_like(self.bloom.bits), 0)
        comb = lambda a, b: (np.bitwise_or(a[0], b[0]), a[1] + b[1])
        bits, counted = (
            df.select(col).rdd.mapPartitions(part_bits)
            .treeAggregate(zero, comb, comb)
        )
        if counted == 0:
            return
        np.bitwise_or(self.bloom.bits, bits, out=self.bloom.bits)
        self.bloom.count += counted
        if self.bloom.count > self.capacity:
            # same contract as add(): past the sized capacity the fp-rate
            # guarantee erodes — hand control back to the anti-join
            self.authoritative = False

    def add(self, key: str) -> None:
        self.bloom.add(key)
        if self.bloom.count > self.capacity:
            # past the sized capacity the fp-rate guarantee erodes AND a
            # rotation-style reset would break supersetness — hand
            # control back to the anti-join instead
            self.authoritative = False

    def add_many(self, keys) -> None:
        for k in keys:
            self.add(k)

    def might_contain(self, key: str) -> bool:
        return self.bloom.might_contain(key)

    def membership(self, keys) -> np.ndarray:
        return self.bloom.membership_batch(list(keys))
