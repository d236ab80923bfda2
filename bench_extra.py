#!/usr/bin/env python3
"""Per-query isolation bench (guide §1.4) — NOT the driver's bench.

Times individual declared queries with the noop sink (or collect for the
small-result ones, matching bench.py's methodology) and optionally dumps
``.explain("formatted")`` plans. Used for the round-6 optimization
before/after evidence in OPTIMIZATION_r06.md; bench.py stays frozen.

Usage:
  python bench_extra.py [--sf DIR] [--repeat N] [--explain-dir DIR] q1 q2 ...
  python bench_extra.py --sf /root/testdata/sf1.0 lsh_candidate_pairs ngram_jaccard
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMALL_RESULT = {"bm25_topk", "bm25_topk_filtered", "top_trending",
                "knn_cosine", "tpch_q1", "tpch_q3", "tpch_q4",
                "tpch_q5", "tpch_q7", "tpch_q10", "tpch_q18",
                "trend_slope", "corpus_stats", "hybrid_topk",
                "pmi_cooccurrence", "range_count", "avg_value"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain-dir", default=None,
                    help="dump .explain('formatted') per query to DIR/<q>.txt")
    ap.add_argument("--suffix", default="",
                    help="filename suffix for explain files (e.g. _before)")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from baram_spark.session import get_spark
    import __spark_entry__ as entry_mod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="baram-bench-extra", master=f"local[{cpus}]")
    queries = entry_mod.queries()
    out: dict[str, list[float]] = {}
    for name in args.names:
        fn = queries[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(f"{args.explain_dir}/{name}{args.suffix}.txt", "w") as f:
                f.write(plan)
        samples = []
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"{name} #{i}")
            t0 = time.time()
            df = fn(spark, args.sf)
            if name in SMALL_RESULT:
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = samples
        print(f"## {name}: {samples}", file=sys.stderr)
    print(json.dumps({"sf_dir": args.sf, "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
