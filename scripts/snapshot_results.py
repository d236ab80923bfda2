#!/usr/bin/env python3
"""Order-insensitive result fingerprints for declared queries.

Round-6 equivalence harness: snapshot a query's full result as a
(row_count, xor-of-row-hashes) fingerprint before an optimization, re-run
after, diff. Mirrors the driver's order-insensitive value-hash idea
(rows canonicalized, floats rounded to 6 dp).

Usage: python scripts/snapshot_results.py --sf /root/testdata/sf0.1 q1 q2
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from baram_spark.session import get_spark
    import __spark_entry__ as entry_mod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="baram-snapshot", master=f"local[{cpus}]")
    queries = entry_mod.queries()
    out = {}
    for name in args.names:
        df = queries[name](spark, args.sf)
        cols = sorted(df.columns)
        exprs = []
        for c in cols:
            col = F.col(c)
            if df.schema[c].dataType.typeName() in ("double", "float"):
                col = F.round(col.cast("double"), 6)
            exprs.append(
                F.coalesce(col.cast("string"), F.lit("<null>")).alias(c)
            )
        canon = df.select(exprs)
        hashed = canon.select(
            F.xxhash64(F.concat_ws("\x1f", *cols)).alias("h")
        )
        # hsum (exact decimal sum) is the multiplicity-sensitive channel:
        # XOR alone cancels on even-multiplicity row swaps ({A,A}->{B,B})
        agg = hashed.agg(
            F.count("*").alias("n"),
            F.bit_xor("h").alias("hxor"),
            F.sum(F.col("h").cast("decimal(38,0)")).alias("hsum"),
        ).first()
        fp = {
            "n": int(agg["n"]),
            "hxor": int(agg["hxor"]) if agg["hxor"] is not None else 0,
            "hsum": str(agg["hsum"]) if agg["hsum"] is not None else "0",
            "cols": cols,
        }
        fp["digest"] = hashlib.sha256(
            json.dumps(fp, sort_keys=True).encode()).hexdigest()[:16]
        out[name] = fp
        print(f"## {name}: n={fp['n']} digest={fp['digest']}", file=sys.stderr)
    print(json.dumps({"sf_dir": args.sf, "fingerprints": out}))
    spark.stop()


if __name__ == "__main__":
    main()
