"""Distributed BM25 top-k search over the sharded postings index.

Query lifecycle (the Spark-native analog of ``baram search`` →
``VectorStore::search_bm25``, ``/root/reference/src/embedding/mod.rs:469-535``
+ ``src/commands/search.rs:95-159``):

1. analyze the query with the SEARCH analyzer (driver-side, tiny).
2. idf weights from ``term_stats`` (parquet scan, predicate pushdown on the
   term-sorted files) + cached ``corpus_stats``.
3. postings lookup: ``term IN (...)`` over ``postings/shard=K`` — the index
   is DOCUMENT-sharded (every doc lives in exactly one shard, the
   OpenSearch/Lucene shard model), so each shard holds all query terms for
   its doc subset and can compute exact local BM25 scores.
4. per-shard block-max-WAND top-k inside an Arrow-batched ``applyInPandas``
   (or driver-side for ``mode="local"`` low-latency paths).
5. global k-merge of the per-shard top-k lists (k·n_shards rows — O(k)
   driver work), deterministic tie-break (score desc, doc_id asc).

Filters from SearchConfig (category / date range / min_score,
``src/embedding/mod.rs:135-175``) apply on the doc-join projection step.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

import numpy as np

from ..index import fs
from ..index.fs import spark_url as _sp
from ..textproc.analyzer import analyze_search
from .bm25 import DEFAULT_K, FIELD_BOOSTS, FIELDS, idf
from .wand import TermPostings, score_blockmax, score_exhaustive

MAX_K = 100  # REST cap, src/commands/serve.rs:426


class SearchEngine:
    def __init__(self, spark: SparkSession, index_dir: str,
                 preload: bool = False):
        """``preload=True`` pins term stats + posting blobs in driver memory
        (the 'open index' serving mode — an OpenSearch node keeps exactly
        this resident); queries then run with zero Spark jobs. Default is
        the cluster mode: parquet-pruned lookups + per-shard scoring.

        The engine reads the snapshot that was committed when it was
        created; call :meth:`refresh` (the OpenSearch refresh analog) to
        pick up generations committed since."""
        self._preload = preload
        self.spark = spark
        self.index_dir = index_dir.rstrip("/")
        # snapshot-consistency loop: everything below reads several tables
        # over multiple seconds; a compact()/vacuum() committing in that
        # window could pair OLD generations with an already-cleared
        # tombstone set (deletes is the one unversioned table). Re-check
        # the manifest after the reads and re-open if the snapshot moved.
        for _attempt in range(3):
            self._open()
            m2 = self._load_manifest()
            if ((m2 or {}).get("snapshot_id")
                    == (self._manifest or {}).get("snapshot_id")):
                break
        else:
            # three snapshots moved under us in a row: serve the last
            # consistent-read attempt but say so — a silent fall-through
            # could pair old generations with a newer tombstone set
            import logging

            logging.getLogger(__name__).warning(
                "index %s: snapshot moved during all 3 open attempts; "
                "serving the last read (snapshot_id=%s) which may pair "
                "generations with a newer tombstone set until refresh()",
                self.index_dir, (self._manifest or {}).get("snapshot_id"))

    def _open(self) -> None:
        spark = self.spark
        preload = self._preload
        # snapshot isolation: when the builder's _manifest.json exists, read
        # ONLY the committed generations — a crashed/in-flight build's
        # partial gen dirs are invisible (the Iceberg-manifest analog) —
        # and the committed VERSION of each small stats table (writers
        # create fresh v_K dirs instead of overwriting, so a pinned reader
        # never has files yanked from under it mid-build).
        self._manifest = self._load_manifest()
        self._committed = self._manifest_gens()
        self.corpus_stats = {
            r["field"]: (int(r["n_docs"]), float(r["avgdl"]))
            for r in spark.read.parquet(
                _sp(self._stats_path("corpus_stats"))
            ).collect()
        }
        post_dir = f"{self.index_dir}/postings"
        self._postings = self._gen_read(post_dir)
        self._term_stats = spark.read.parquet(
            _sp(self._stats_path("term_stats")))
        self._has_gens = "gen" in self._postings.columns
        # block-max bound correction per (gen, field): avgdl_now/avgdl_pack
        # capped below at 1 (see wand.TermPostings)
        self._bound_factor: dict = {}
        gm_path = self._stats_path("gen_meta")
        if self._has_gens and fs.exists(gm_path):
            for r in spark.read.parquet(_sp(gm_path)).collect():
                _, avgdl_now = self.corpus_stats.get(r["field"], (0, 0.0))
                pack = float(r["avgdl_pack"]) or avgdl_now
                self._bound_factor[(int(r["gen"]), r["field"])] = max(
                    1.0, avgdl_now / pack if pack else 1.0
                )
        # a committed gen MISSING its bound row cannot prove pack-time
        # avgdl == current, so its blobs must never be pruned: the default
        # becomes a large FINITE factor (inf would turn a 0.0 block-max
        # into 0*inf = NaN, whose comparisons are all False — the block
        # would be wrongly SKIPPED, not kept). Single-generation layouts
        # without gen_meta packed with the same stats they score with.
        self._bound_missing = (
            1e12 if self._has_gens and len(self._committed or []) > 1
            else 1.0
        )
        self.n_shards = self._detect_n_shards()
        # tombstones (delete_by_query analog): excluded pre-ranking like
        # Lucene deleted docs; reclaimed by IndexBuilder.compact(). The set
        # is small by contract (deleted-docs-bitmap regime) so it rides to
        # executors inside the task closure.
        self._denied = self._load_denied()
        self._mem_df: dict | None = None
        self._mem_postings: dict | None = None
        self._pa_ds = None  # lazily-built pyarrow dataset (local mode)
        if preload:
            self._mem_df = {
                (r["field"], r["term"]): int(r["df"])
                for r in self._term_stats.collect()
            }
            self._mem_postings = {}
            for r in self._postings.collect():
                gen = int(r["gen"]) if self._has_gens else 0
                self._mem_postings.setdefault((r["field"], r["term"]), []).append(
                    (int(r["shard"]), bytes(r["postings"]), bytes(r["skips"]),
                     bytes(r["blockmax"]), gen)
                )

    def refresh(self) -> "SearchEngine":
        """Re-open the index at the latest committed snapshot (new
        generations, deletions, compactions become visible) — the S11
        'refresh' analog. Re-runs __init__ in place; cached file listings,
        preloaded blobs, and the pyarrow dataset are all rebuilt."""
        self.__init__(self.spark, self.index_dir, preload=self._preload)
        return self

    # ------------------------------------------------------------------
    def _load_manifest(self) -> dict | None:
        # pointer-protocol aware (object stores) with the single-file
        # _manifest.json as the local/legacy path — see fs.read_manifest
        return fs.read_manifest(self.index_dir)

    def _manifest_gens(self) -> list[int] | None:
        """Generations listed by the builder's snapshot manifest, or None
        when the index predates manifests (fall back to directory listing)."""
        gens = (self._manifest or {}).get("generations")
        # an EMPTY committed list (everything tombstoned then compacted)
        # is a real snapshot state, distinct from "no manifest": it must
        # read as an empty index, never fall back to the whole dir where
        # retained superseded generations would resurrect deleted docs
        return sorted(int(g) for g in gens) if gens is not None else None

    def _stats_path(self, name: str) -> str:
        """Resolve a small stats table to its committed version (manifest),
        else the newest on-disk version, else the bare pre-versioning dir."""
        import re

        base = f"{self.index_dir}/{name}"
        v = (self._manifest or {}).get(f"{name}_v")
        if v is not None:
            cand = f"{base}/v_{int(v)}"
            if fs.exists(cand):
                return cand
        vs = [
            int(m.group(1))
            for d in fs.listdir(base)
            if (m := re.match(r"v_(\d+)$", d))
        ]
        if vs:
            return f"{base}/v_{max(vs)}"
        return base

    #: explicit schemas for EMPTY snapshots: a compact-to-empty index
    #: whose gen dirs were vacuumed has nothing left for parquet schema
    #: inference, yet must still open as an empty index
    _POSTINGS_EMPTY = (
        "shard int, field string, term string, salt int, df long, "
        "postings binary, skips binary, blockmax binary, gen int"
    )
    _DOCS_EMPTY = (
        "doc_id long, url string, oid string, aid string, title string, "
        "text string, category string, published_at timestamp, "
        "publisher string, author string, format string, "
        "content_hash string, warc_ts timestamp, lang string, gen int"
    )
    _ATTRS_EMPTY = (
        "doc_id long, shard int, category string, publisher string, "
        "published_at timestamp, gen int"
    )

    def _empty_rel(self, d: str, schema: str) -> DataFrame:
        """Empty relation for dir ``d``: prefer the on-disk schema (keeps
        optional columns like chunk_text) but survive a dir with no
        parquet files left (post-vacuum empty snapshot)."""
        try:
            return self.spark.read.parquet(_sp(d)).filter(F.lit(False))
        except Exception:
            return self.spark.createDataFrame([], schema)

    def _gen_read(self, d: str, empty_schema: str | None = None) -> DataFrame:
        """Read a gen-partitioned table at the committed snapshot; an
        empty committed list is an EMPTY relation, not a whole-dir read."""
        if self._committed is None:
            return self.spark.read.parquet(_sp(d))
        if self._committed:
            return self.spark.read.option("basePath", _sp(d)).parquet(
                *[_sp(f"{d}/gen={g}") for g in self._committed]
            )
        return self._empty_rel(d, empty_schema or self._POSTINGS_EMPTY)

    def _docs(self) -> DataFrame:
        return self._gen_read(f"{self.index_dir}/docs",
                              empty_schema=self._DOCS_EMPTY)

    def _detect_n_shards(self) -> int:
        """n_shards of the PINNED snapshot: the manifest records the
        committing builder's value (snapshot-isolated — index_meta is
        overwritten at the START of a build, so reading it mid-build
        could hand a different modulus to the doc→shard cogroup math);
        pre-manifest layouts fall back to index_meta, then to listing the
        postings shard directories."""
        v = (self._manifest or {}).get("n_shards")
        if v is not None:
            return int(v)
        meta = f"{self.index_dir}/index_meta"
        if fs.exists(meta):
            rows = self.spark.read.parquet(_sp(meta)).collect()
            if rows:
                return int(rows[0]["n_shards"])
        shards = {
            int(d.split("=", 1)[1])
            for d in fs.walk_dir_names(f"{self.index_dir}/postings")
            if d.startswith("shard=")
        }
        return (max(shards) + 1) if shards else 1

    def _load_denied(self):
        deletes = f"{self.index_dir}/deletes"
        if not fs.exists(deletes):
            return None
        try:
            tbl = fs.read_parquet(deletes)
        except FileNotFoundError:
            # concurrent compact cleared the files between exists and
            # read; the __init__ snapshot re-check re-opens consistently
            return None
        # any OTHER read error must propagate: returning None here would
        # silently RESURRECT tombstoned docs on a transient store error
        # (same fail-closed convention as fs.listdir)
        if "doc_id" not in tbl.column_names:
            return None  # dir left behind with zero files (post-compact)
        ids = tbl["doc_id"].to_numpy()
        if ids.size == 0:
            return None
        return np.unique(ids.astype(np.int64))

    def _doc_attrs(self) -> DataFrame | None:
        """The build-time filter ATTRIBUTE INDEX (doc_id, shard, category,
        published_at), sorted by the filter keys so min-max row-group
        pruning skips non-matching groups — the index-time keyword/date
        field analog (mod.rs:237-330). None on pre-attrs layouts."""
        d = f"{self.index_dir}/doc_attrs"
        if not fs.exists(d):
            return None
        if self._committed:
            dirs = [f"{d}/gen={g}" for g in self._committed]
            if not all(fs.exists(p) for p in dirs):
                # mixed layout (e.g. pre-attrs gens next to new waves):
                # a partial attribute index would silently DROP candidates
                # from the uncovered generations — fall back to docs
                return None
            return self.spark.read.option("basePath", _sp(d)).parquet(
                *[_sp(p) for p in dirs])
        if self._committed is not None:  # empty snapshot: empty attrs
            return self._empty_rel(d, self._ATTRS_EMPTY)
        return self.spark.read.parquet(_sp(d))

    def _allowed_docs(self, category, date_from, date_to, publisher=None):
        """Filter-context candidate set (doc_id, shard) — the reference's
        bool-filter on category / publisher / published_at range
        (mod.rs:509-531).

        The filter is a pushed-down parquet predicate over the doc_attrs
        attribute index (falling back to a column-pruned docs scan on
        old layouts, or when an old attrs layout predates the publisher
        column); doc_attrs carries the shard precomputed with the
        same expression the builder used, so the set cogroups 1:1 with
        the postings shards. Returns None when no filter is active."""
        if (category is None and date_from is None and date_to is None
                and publisher is None):
            return None
        cond = F.lit(True)
        if category is not None:
            cond = cond & (F.col("category") == category)
        if publisher is not None:
            cond = cond & (F.col("publisher") == publisher)
        if date_from is not None:
            cond = cond & (F.col("published_at") >= F.lit(date_from).cast("timestamp"))
        if date_to is not None:
            cond = cond & (F.col("published_at") <= F.lit(date_to).cast("timestamp"))
        attrs = self._doc_attrs()
        if attrs is not None and (publisher is None
                                  or "publisher" in attrs.columns):
            return attrs.filter(cond).select("doc_id", "shard")
        from ..index.build import shard_expr

        return self._docs().filter(cond).select(
            "doc_id", shard_expr(self.n_shards).cast("int").alias("shard")
        )

    def _weights(self, terms: list[str]) -> dict:
        """{(field, term): boost * idf} from global df (one pruned scan,
        or the in-memory dictionary when preloaded)."""
        if not terms:
            return {}
        if self._mem_df is not None:
            pairs = [
                (f, t, self._mem_df.get((f, t)))
                for f in FIELDS
                for t in terms
            ]
            rows = [
                {"field": f, "term": t, "df": d} for f, t, d in pairs if d
            ]
        else:
            rows = (
                self._term_stats.filter(F.col("term").isin(terms))
                .select("field", "term", "df")
                .collect()
            )
        weights = {}
        for r in rows:
            n_docs, _ = self.corpus_stats.get(r["field"], (0, 0.0))
            if n_docs and r["df"]:
                weights[(r["field"], r["term"])] = FIELD_BOOSTS[r["field"]] * idf(
                    n_docs, int(r["df"])
                )
        return weights

    def _postings_rows_local(self, terms: list[str]) -> list[tuple]:
        """Driver-side pruned postings lookup — ZERO Spark jobs.

        local mode collects the matching posting blobs to the driver anyway,
        so the lookup goes through a pyarrow dataset with the same
        (field, term) predicate the Spark path pushes down (file/row-group
        min-max pruning on the term-sorted files). The dataset's file
        listing is cached like the Spark FileIndex; rebuilds need a fresh
        engine (documented engine contract)."""
        import pyarrow.dataset as ds

        if self._pa_ds is None:
            pa_fs, pa_path = fs.resolve(f"{self.index_dir}/postings")
            self._pa_ds = ds.dataset(
                pa_path,
                format="parquet",
                partitioning="hive",
                filesystem=pa_fs,
            )
        names = set(self._pa_ds.schema.names)
        filt = ds.field("term").isin(terms) & ds.field("field").isin(
            list(FIELDS)
        )
        if self._committed is not None and "gen" in names:
            filt = filt & ds.field("gen").isin(self._committed)
        cols = ["field", "term", "df", "postings", "skips", "blockmax"]
        cols += [c for c in ("gen", "shard") if c in names]
        tbl = self._pa_ds.to_table(filter=filt, columns=cols)
        d = tbl.to_pydict()
        n = tbl.num_rows
        gens = d.get("gen", [0] * n)
        shards = d.get("shard", [0] * n)
        return [
            (d["field"][i], d["term"][i], int(d["df"][i]),
             bytes(d["postings"][i]), bytes(d["skips"][i]),
             bytes(d["blockmax"][i]), int(gens[i]), int(shards[i]))
            for i in range(n)
        ]

    def _postings_rows(self, terms: list[str]) -> DataFrame:
        cols = ["shard", "field", "term", "df", "postings", "skips", "blockmax"]
        sel = self._postings.filter(
            F.col("term").isin(terms) & F.col("field").isin(list(FIELDS))
        )
        if self._has_gens:
            return sel.select(*cols, "gen")
        return sel.select(*cols).withColumn("gen", F.lit(0))

    # ------------------------------------------------------------------
    def search(
        self,
        query_text: str,
        k: int = DEFAULT_K,
        min_score: float | None = None,
        mode: str = "distributed",
        prune: bool = True,
        category: str | None = None,
        date_from=None,
        date_to=None,
        allowed_ids=None,
        publisher: str | None = None,
    ) -> list[tuple[int, float]]:
        """Top-k (doc_id, score); rank-identical to the brute-force oracle.

        ``category`` / ``publisher`` / ``date_from`` / ``date_to`` apply
        PRE-ranking as
        filter context (the reference's bool-filter, mod.rs:509-531): the
        candidate set is restricted before top-k, scores of surviving docs
        are unchanged. Distributed mode ships the per-shard allowed sets via
        a shard cogroup (never through the driver); local mode collects them
        (the low-latency serving path, fine for selective filters).

        ``allowed_ids`` lets a serving tier that already holds the doc
        metadata pass a precomputed sorted candidate array directly — zero
        Spark jobs for filtered local-mode queries."""
        if k <= 0:
            return []  # k=0 means "no hits", not "one hit"
        k = min(k, MAX_K)  # upper cap only; negative k would slice
        # "all but the last" in the top-k merges and defeat the cap
        terms = sorted(set(analyze_search(query_text)))
        if not terms:
            return []
        if self._committed == []:  # empty snapshot: nothing to score
            return []
        avgdls = {f: self.corpus_stats[f][1] for f in self.corpus_stats}
        scorer = score_blockmax if prune else score_exhaustive
        allowed_flat: np.ndarray | None = None
        allowed_df = None
        if allowed_ids is not None:
            if (category is not None or publisher is not None
                    or date_from is not None or date_to is not None):
                # silently dropping the facets would return unfiltered
                # results; the serving tier intersects facets INTO its
                # precomputed allowed array before calling
                raise ValueError(
                    "allowed_ids cannot be combined with category/"
                    "publisher/date filters — intersect them into "
                    "allowed_ids first")
            # ndarray input (the serving tier's precomputed sorted array)
            # passes straight into np.unique — no python-list round-trip
            arr = (allowed_ids if isinstance(allowed_ids, np.ndarray)
                   else np.asarray(list(allowed_ids), dtype=np.int64))
            allowed_flat = np.unique(arr.astype(np.int64, copy=False))
            if allowed_flat.size == 0:
                return []  # empty candidate set: nothing can match —
                # also avoids a zero-row createDataFrame + full postings
                # scan in distributed mode
            if mode != "local":
                from ..index.build import shard_expr

                allowed_df = self.spark.createDataFrame(
                    pd.DataFrame({"doc_id": allowed_flat})
                ).select(
                    "doc_id",
                    shard_expr(self.n_shards).cast("int").alias("shard"),
                )
        else:
            allowed_df = self._allowed_docs(category, date_from, date_to,
                                            publisher)
        denied = self._denied

        if mode == "local":
            allowed_by_shard: dict[int, np.ndarray] | None = None
            if allowed_flat is not None:
                pass  # one flat membership array serves every shard
            elif allowed_df is not None:
                rows = allowed_df.collect()
                tmp: dict[int, list] = {}
                for r in rows:
                    tmp.setdefault(int(r["shard"]), []).append(int(r["doc_id"]))
                allowed_by_shard = {
                    s: np.sort(np.asarray(ids, dtype=np.int64))
                    for s, ids in tmp.items()
                }
            # ONE job (or zero when preloaded): global df is the sum of the
            # per-row df over all shards+generations of a term — derived
            # from the same collected rows that carry the blobs, so no
            # separate term_stats lookup is needed.
            if self._mem_postings is not None:
                rows = [
                    (field, term, None, blob, skips, bmax, gen, shard)
                    for field in FIELDS
                    for term in terms
                    for shard, blob, skips, bmax, gen in self._mem_postings.get(
                        (field, term), ()
                    )
                ]
                df_by_key = {
                    (f, t): self._mem_df.get((f, t), 0)
                    for f in FIELDS
                    for t in terms
                }
            else:
                try:
                    rows = self._postings_rows_local(terms)
                except Exception:
                    # fall back to the one-job Spark path (e.g. a remote
                    # FS pyarrow can't reach) — but SAY so: a corrupt
                    # footer silently costing a Spark job per query is an
                    # operator problem, not a code path
                    import logging

                    logging.getLogger(__name__).warning(
                        "local postings lookup failed; falling back to "
                        "the Spark path for this query", exc_info=True,
                    )
                    collected = self._postings_rows(terms).collect()
                    rows = [
                        (r["field"], r["term"], int(r["df"]),
                         bytes(r["postings"]), bytes(r["skips"]),
                         bytes(r["blockmax"]), int(r["gen"]),
                         int(r["shard"]))
                        for r in collected
                    ]
                df_by_key: dict = {}
                for f, t, d, *_ in rows:
                    df_by_key[(f, t)] = df_by_key.get((f, t), 0) + d
            weights = {}
            for (f, t), d in df_by_key.items():
                n_docs, _ = self.corpus_stats.get(f, (0, 0.0))
                if n_docs and d:
                    weights[(f, t)] = FIELD_BOOSTS[f] * idf(n_docs, d)
            if not weights:
                return []
            by_shard: dict[int, list] = {}
            for field, term, _, blob, skips, bmax, gen, shard in rows:
                w = weights.get((field, term))
                if w is None:
                    continue
                by_shard.setdefault(shard, []).append(
                    TermPostings(
                        field, term, w, blob, skips, bmax, avgdls[field],
                        self._bound_factor.get((gen, field),
                                               self._bound_missing),
                    )
                )
            partials = []
            for shard, shard_terms in by_shard.items():
                allowed = allowed_flat
                if allowed is None and allowed_by_shard is not None:
                    allowed = allowed_by_shard.get(shard)
                    if allowed is None:
                        continue  # no doc in this shard passes the filter
                partials.extend(scorer(shard_terms, k, min_score,
                                       allowed=allowed, denied=denied))
            return _merge_topk(partials, k)

        weights = self._weights(terms)
        if not weights:
            return []

        # distributed: per-shard scoring in executors, k-merge on driver
        out_schema = "doc_id long, score double"

        bound_factor = dict(self._bound_factor)
        bound_missing = self._bound_missing
        filtered = allowed_df is not None

        def _score_rows(pdf: pd.DataFrame, allowed) -> pd.DataFrame:
            tps = []
            for row in pdf.itertuples():
                wkey = (row.field, row.term)
                if wkey not in weights:
                    continue
                tps.append(
                    TermPostings(
                        row.field, row.term, weights[wkey],
                        bytes(row.postings), bytes(row.skips),
                        bytes(row.blockmax), avgdls[row.field],
                        bound_factor.get((int(row.gen), row.field),
                                         bound_missing),
                    )
                )
            hits = scorer(tps, k, min_score, allowed=allowed, denied=denied)
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([h[0] for h in hits], dtype="int64"),
                    "score": pd.Series([h[1] for h in hits], dtype="float64"),
                }
            )

        if filtered:
            # shard-cogroup: each shard's task receives its postings AND its
            # allowed doc set — no filter set ever crosses the driver.
            def score_shard_filtered(left: pd.DataFrame,
                                     right: pd.DataFrame) -> pd.DataFrame:
                if len(left) == 0 or len(right) == 0:
                    return pd.DataFrame(
                        {"doc_id": pd.Series([], dtype="int64"),
                         "score": pd.Series([], dtype="float64")}
                    )
                allowed = np.sort(right["doc_id"].to_numpy(dtype=np.int64))
                return _score_rows(left, allowed)

            partial_rows = (
                self._postings_rows(terms)
                .groupBy("shard")
                .cogroup(allowed_df.groupBy("shard"))
                .applyInPandas(score_shard_filtered, schema=out_schema)
                .collect()
            )
        else:

            def score_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
                return _score_rows(pdf, None)

            partial_rows = (
                self._postings_rows(terms)
                .groupBy("shard")
                .applyInPandas(score_shard, schema=out_schema)
                .collect()
            )
        partials = [(int(r["doc_id"]), float(r["score"])) for r in partial_rows]
        return _merge_topk(partials, k)

    # ------------------------------------------------------------------
    def search_df(self, query_text: str, k: int = DEFAULT_K,
                  min_score: float | None = None,
                  category: str | None = None,
                  date_from=None, date_to=None,
                  publisher: str | None = None,
                  include_highlights: bool = True) -> DataFrame:
        """Search + doc projection (Q6): rank, score, title, url, category,
        publisher, published_at, 500-char content, and (Q5) ``highlights``
        — the reference SearchResult shape (src/embedding/mod.rs:88-116,
        _source projection 608-610, truncation 855-869). category/date
        filters apply PRE-ranking (filter context), so a filtered search
        still returns up to k hits."""
        hits = self.search(query_text, k=k, min_score=min_score,
                           category=category, date_from=date_from,
                           date_to=date_to, publisher=publisher)
        hits_df = self.spark.createDataFrame(
            [(d, s, r) for r, (d, s) in enumerate(hits, 1)],
            "doc_id long, score double, rank int",
        )
        docs = self._docs()
        out = docs.join(F.broadcast(hits_df), "doc_id").select(
            "rank", "doc_id", "score", "title", "url", "category",
            "publisher", "published_at", "text",
            F.expr(
                "case when length(text) > 500 then concat(substring(text,1,497),'...') "
                "else text end"
            ).alias("content"),
        )
        if include_highlights:
            from .hybrid import highlight

            def add_highlights(iterator):
                # reference highlight shape (mod.rs:612-621, flattened
                # title-then-content in parse_search_hits 636-655):
                # 1 title fragment + up to 3×150-char content fragments
                for pdf in iterator:
                    pdf = pdf.copy()
                    pdf["highlights"] = [
                        highlight(title or "", query_text, n_fragments=1,
                                  frag_len=100)
                        + highlight(t or "", query_text)
                        for title, t in zip(pdf["title"], pdf["text"])
                    ]
                    yield pdf.drop(columns=["text"])

            schema = (
                "rank int, doc_id long, score double, title string, "
                "url string, category string, publisher string, "
                "published_at timestamp, content string, "
                "highlights array<string>"
            )
            out = out.mapInPandas(add_highlights, schema=schema)
        else:
            out = out.drop("text")
        return out.orderBy("rank")


def _merge_topk(partials: list[tuple[int, float]], k: int):
    """Global k-merge with the canonical tie-break."""
    partials.sort(key=lambda x: (-x[1], x[0]))
    return partials[:k]
