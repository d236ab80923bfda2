"""From-scratch byte-level BPE subword tokenizer (A3).

The reference wraps HuggingFace tokenizers for embedding-side token ids,
token counting, decode, and stats (``/root/reference/src/embedding/
tokenizer.rs:143-181``). That crate isn't available here, so this module
implements the same surface from scratch:

- **Training** is the classic BPE loop over a word-frequency table. The
  corpus pass is the only part that touches big data, and it is ONE
  distributed shuffle: regex pre-tokenize + explode + groupBy count
  (pure ``F.*``, JVM-side), truncated to the top ``max_word_types`` word
  types. The merge loop then runs driver-side over that bounded table —
  exactly how production BPE trainers work (the corpus is never
  re-scanned per merge).
- **Encoding** is byte-level: the 256 byte values are the base vocab, so
  every string tokenizes with ZERO unknown tokens and ``decode`` is a
  lossless inverse of ``encode``. Merge application memoizes per word
  type, so Arrow batches amortize to a dict lookup per repeated word.
- **Operator**: :func:`subword_tokenize` maps a DataFrame column to
  (token_ids, token_count) via ``mapInPandas`` — narrow, shuffle-free,
  tokenizer shipped by value in the closure.

Not SQL-expressible, so correctness is pinned by pytest round-trip and
determinism properties rather than a DuckDB oracle (like the other
approximate/stateful operators).
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame, functions as F

#: pre-tokenization: alternate runs of whitespace / non-whitespace.
#: Concatenating the pre-tokens reproduces the text exactly, which is
#: what makes decode(encode(text)) == text.
_PRETOKEN_RE = re.compile(r"\s+|\S+")
#: (?U) = Java UNICODE_CHARACTER_CLASS, so Spark's \s matches the same
#: Unicode whitespace (U+3000, NBSP, ...) Python's re does. One residual
#: gap: Python's \s ALSO matches the file/group/record/unit separators
#: U+001C-001F (not Unicode White_Space, so Java's (?U)\s does not) —
#: the explicit classes below close it, so the distributed word counts
#: train over exactly the word types the encoder produces
_PRETOKEN_SQL = r"(?U)[\\s\\x1c-\\x1f]+|[^\\s\\x1c-\\x1f]+"


def pretokenize(text: str) -> list[str]:
    return _PRETOKEN_RE.findall(text or "")


def train_bpe(word_counts: dict[bytes, int], vocab_size: int,
              min_frequency: int = 2) -> list[tuple[bytes, bytes]]:
    """Greedy BPE merges from a word-frequency table, deterministic:
    ties break on the lexicographically smallest pair. Returns the merge
    list in rank order (vocab = 256 bytes + one token per merge).

    Incremental, the way production trainers work: the pair-count table
    and a pair→word index are built once; each merge touches only the
    words that actually CONTAIN the merged pair, adjusting the counts of
    the pairs adjacent to every application — never a full rescan of the
    word table per merge."""
    words: list[tuple[list[bytes], int]] = [
        ([bytes([c]) for c in wb], cnt) for wb, cnt in sorted(
            word_counts.items()
        ) if wb
    ]
    pair_counts: Counter = Counter()
    pair_words: dict[tuple, set] = {}
    for wi, (parts, cnt) in enumerate(words):
        for i in range(len(parts) - 1):
            pair = (parts[i], parts[i + 1])
            pair_counts[pair] += cnt
            pair_words.setdefault(pair, set()).add(wi)

    merges: list[tuple[bytes, bytes]] = []
    while 256 + len(merges) < vocab_size and pair_counts:
        # max count; smallest pair on ties — deterministic across runs
        best_pair, best_n = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best_n < min_frequency:
            break
        merges.append(best_pair)
        a, b = best_pair
        merged = a + b
        for wi in sorted(pair_words.get(best_pair, ())):
            parts, cnt = words[wi]
            i = 0
            while i < len(parts) - 1:
                if parts[i] != a or parts[i + 1] != b:
                    i += 1
                    continue
                # neighbors' pair counts shift around the merge site
                if i > 0:
                    left = (parts[i - 1], a)
                    pair_counts[left] -= cnt
                    if pair_counts[left] <= 0:
                        del pair_counts[left]
                    new_left = (parts[i - 1], merged)
                    pair_counts[new_left] += cnt
                    pair_words.setdefault(new_left, set()).add(wi)
                if i + 2 < len(parts):
                    right = (b, parts[i + 2])
                    pair_counts[right] -= cnt
                    if pair_counts[right] <= 0:
                        del pair_counts[right]
                    new_right = (merged, parts[i + 2])
                    pair_counts[new_right] += cnt
                    pair_words.setdefault(new_right, set()).add(wi)
                parts[i:i + 2] = [merged]
        pair_counts.pop(best_pair, None)
        pair_words.pop(best_pair, None)
    return merges


class BpeTokenizer:
    """Byte-level BPE encode/decode/count (tokenizer.rs:143-181 analog).
    Picklable by value — safe to close over in Arrow UDFs."""

    def __init__(self, merges: list[tuple[bytes, bytes]]):
        self.merges = list(merges)
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.vocab: dict[bytes, int] = {bytes([i]): i for i in range(256)}
        for a, b in merges:
            self.vocab[a + b] = len(self.vocab)
        self.inv = {i: b for b, i in self.vocab.items()}
        self._cache: dict[bytes, list[int]] = {}

    def __getstate__(self):
        return self.merges

    def __setstate__(self, merges):
        self.__init__(merges)

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    #: per-word memo bound — high-cardinality pre-tokens (numbers, urls,
    #: hashes) would otherwise grow the cache without limit inside
    #: long-lived executor processes
    CACHE_MAX = 1 << 20

    def _encode_word(self, wb: bytes) -> list[int]:
        hit = self._cache.get(wb)
        if hit is not None:
            return hit
        parts = [bytes([c]) for c in wb]
        while len(parts) > 1:
            best_rank, best_i = None, -1
            for i in range(len(parts) - 1):
                r = self.ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            parts[best_i:best_i + 2] = [parts[best_i] + parts[best_i + 1]]
        ids = [self.vocab[p] for p in parts]
        if len(self._cache) >= self.CACHE_MAX:
            self._cache.clear()  # cheap bound; hot words re-warm fast
        self._cache[wb] = ids
        return ids

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        for w in pretokenize(text):
            ids.extend(self._encode_word(w.encode("utf-8")))
        return ids

    def decode(self, ids: list[int]) -> str:
        return b"".join(self.inv[i] for i in ids).decode("utf-8")

    def count_tokens(self, text: str) -> int:
        return len(self.encode(text))


def bpe_word_counts(df: DataFrame, col: str = "text",
                    max_word_types: int = 50_000) -> dict[bytes, int]:
    """The ONE distributed pass of training: pre-tokenize + explode +
    count, truncated to the most frequent ``max_word_types`` word types
    (ties broken on the word for determinism). At 100 TB this is a single
    map-side-combined shuffle over word types, not corpus rows."""
    rows = (
        df.select(
            F.explode(
                F.expr(f"regexp_extract_all({col}, '{_PRETOKEN_SQL}', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w"))
        .limit(max_word_types)
        .collect()
    )
    return {r["w"].encode("utf-8"): int(r["cnt"]) for r in rows}


def train_bpe_spark(df: DataFrame, col: str = "text",
                    vocab_size: int = 1024, min_frequency: int = 2,
                    max_word_types: int = 50_000) -> BpeTokenizer:
    """Distributed-count + driver-merge BPE training."""
    counts = bpe_word_counts(df, col, max_word_types)
    return BpeTokenizer(train_bpe(counts, vocab_size, min_frequency))


def subword_tokenize(df: DataFrame, tokenizer: BpeTokenizer,
                     col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(id, token_ids, token_count) per row — Arrow-batched, narrow
    (no shuffle), the HF-tokenize stage of an embedding pipeline."""
    import pandas as pd

    def run(iterator):
        for pdf in iterator:
            encoded = [tokenizer.encode(t or "") for t in pdf[col]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "token_ids": encoded,
                "token_count": [len(e) for e in encoded],
            })

    return df.select(id_col, col).mapInPandas(
        run, schema=f"{id_col} long, token_ids array<int>, token_count int"
    )
