#!/usr/bin/env python3
"""Benchmark harness — prints ONE JSON line for the driver.

Covers both benchmark surfaces:

1. The crawl→extract→index→search engine on the deterministic synthetic
   pages corpus (index-build docs/sec + postings/sec, BM25 top-10 latency
   over the 10-query reference set) — the BASELINE.json headline metric.
2. The oracle-checked operator queries on $SPARK_GRAFT_SF_DIR (default
   /root/testdata/sf0.1): scans/aggregations/windows/joins/dedup/kNN.

Env knobs:
  SPARK_GRAFT_SF_DIR   table dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] (default 32)
  SPARK_GRAFT_BENCH_DOCS  synthetic corpus size for the index bench
                          (default 20000)

Scaling-efficiency evidence (N vs 4N cores) is produced by
scripts/scaling_bench.py (separate clean-JVM runs; see BENCH.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# operator queries timed against the sf tables (collect-safe or noop-sunk)
OPERATOR_QUERIES = [
    "bm25_topk", "bm25_topk_filtered", "doc_tf", "term_df", "moving_average",
    "trend_slope", "spike_zscore", "minmax_normalize", "top_trending",
    "dedup_exact", "minhash_signatures", "simhash", "knn_cosine",
    "token_counts", "quality_scores", "fingerprint", "language_id",
    "chunking", "sessionize", "tpch_q1", "tpch_q3", "tpch_q4",
    "tpch_q5", "tpch_q7", "tpch_q10", "tpch_q18",
    "anti_join_dedup", "json_extract",
    # quadratic-family + remaining oracle queries (all 36 timed): the
    # LSH/Jaccard pair is the one to watch for blowup as sf grows
    "lsh_candidate_pairs", "ngram_jaccard", "pmi_cooccurrence",
    "hybrid_topk", "percent_change", "range_count", "avg_value",
    "corpus_stats", "ontology_triples", "entity_linking",
]
SMALL_RESULT = {"bm25_topk", "bm25_topk_filtered", "top_trending",
                "knn_cosine", "tpch_q1", "tpch_q3", "tpch_q4",
                "tpch_q5", "tpch_q7", "tpch_q10", "tpch_q18",
                "trend_slope", "corpus_stats", "hybrid_topk",
                "pmi_cooccurrence", "range_count", "avg_value"}


def main() -> None:
    from baram_spark.corpus import make_query_set, pages_df
    from baram_spark.index.builder import IndexBuilder
    from baram_spark.query.engine import SearchEngine
    from baram_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="baram-bench", master=f"local[{CPUS}]")
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    timings: dict[str, float] = {}
    extras: dict = {}

    # ---- 1. index build + BM25 query bench on the synthetic corpus -------
    work = tempfile.mkdtemp(prefix="baram_bench_")
    try:
        # materialize the input corpus first (untimed — the engine's input
        # is an existing pages table, not the generator)
        pages_path = f"{work}/pages"
        pages_df(spark, N_DOCS, partitions=int(CPUS) * 2).write.parquet(pages_path)
        pages = spark.read.parquet(pages_path)

        # warm the python-worker pool + JIT before timing (same methodology
        # as scripts/scaling_bench.py): a long-lived cluster's workers are
        # warm — process spawn + pandas/numpy/baram imports and first-call
        # JIT are cold-start costs, not what the build pipeline does.
        import pandas as _pd

        def _warm(it):
            from baram_spark.textproc.analyzer import analyze_index
            from baram_spark.textproc.extract import extract_batch  # noqa: F401

            for pdf in it:
                analyze_index("워밍업 warm")
                yield _pd.DataFrame({"x": [len(pdf)]})

        n_warm = int(CPUS) * 2
        spark.range(0, n_warm, 1, n_warm).mapInPandas(_warm, "x long").count()

        builder = IndexBuilder(
            spark, f"{work}/idx", n_shards=8,
            salt_threshold=max(N_DOCS // 8, 1000), shard_concurrency=4,
        )
        t0 = time.time()
        metrics = builder.build(pages, fingerprint=f"bench-{N_DOCS}", resume=False)
        timings["index_build"] = time.time() - t0
        extras["index_docs"] = N_DOCS
        extras["docs_per_sec"] = round(N_DOCS / timings["index_build"], 2)
        extras["postings_built"] = metrics.get("postings_built", 0)
        extras["postings_per_sec"] = round(metrics.get("postings_per_sec", 0.0), 2)
        extras["extract_docs_per_sec"] = round(metrics.get("docs_per_sec", 0.0), 2)
        extras["stage_seconds"] = {
            s: round(metrics[k], 2)
            for s, k in (
                ("extract", "extract_seconds"), ("tokenize", "tokenize_seconds"),
                ("stats", "stats_seconds"), ("postings", "postings_seconds"),
            )
            if k in metrics
        }

        # compression telemetry: bytes/posting per codec (untimed — a
        # baseline for future codec work, not part of the build wall)
        extras["codec_stats"] = builder.codec_stats(persist=True)

        qset = make_query_set()
        # cold path: parquet-pruned lookup + per-shard scoring (cluster mode)
        engine = SearchEngine(spark, f"{work}/idx")
        engine.search(qset[0]["query_text"], k=10, mode="local")  # warm JIT
        lat = []
        t0 = time.time()
        for q in qset:
            tq = time.time()
            engine.search(q["query_text"], k=q["k"], mode="local")
            lat.append(time.time() - tq)
        timings["bm25_query_set"] = time.time() - t0
        extras["bm25_mean_latency_ms"] = round(1000 * sum(lat) / len(lat), 1)

        # hot path: preloaded serving mode (the OpenSearch-node analog)
        hot = SearchEngine(spark, f"{work}/idx", preload=True)
        lat_hot = []
        for q in qset:
            tq = time.time()
            hot.search(q["query_text"], k=q["k"], mode="local")
            lat_hot.append(time.time() - tq)
        extras["bm25_hot_mean_latency_ms"] = round(
            1000 * sum(lat_hot) / len(lat_hot), 2
        )
        extras["bm25_hot_max_latency_ms"] = round(1000 * max(lat_hot), 2)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # ---- 2. operator queries over the provided sf tables ------------------
    queries = entry_mod.queries()
    for name in OPERATOR_QUERIES:
        fn = queries[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        if name in SMALL_RESULT:
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()
        timings[name] = time.time() - t0

    total = sum(timings.values())
    out = {
        "metric": "index-build docs/sec + BM25 top-10 latency + operator suite wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **extras,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
