"""Per-partition lineage ledger — checkpoint/resume + throughput metrics.

The Spark-native analog of Baram's ``CheckpointManager`` + ``DedupRecord``
ledger (``/root/reference/src/storage/checkpoint.rs:50-307``,
``src/storage/dedup.rs:111-130``): every completed build stage (and every
postings shard) appends one row; a re-run skips work whose
(stage, partition_id, fingerprint) is already present — the analog of the
reference's filename-ID checkpoint prefilter (``src/commands/index.rs:160-194``)
expressed as a table lookup instead of a JSON blob.

Appends are parquet-append jobs → atomic at file granularity the same way
Baram's tmp+rename is (``checkpoint.rs:234-245``).
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import SparkSession, functions as F

LINEAGE_SCHEMA = (
    "stage string, partition_id int, fingerprint string, rows_in long, "
    "rows_out long, seconds double, rows_per_sec double, completed_at timestamp"
)


class LineageLedger:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self):
        import os

        local = self.path.removeprefix("file:")
        if not os.path.exists(local):
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        try:
            return self.spark.read.parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)

    def completed(self, fingerprint: str) -> set[tuple[str, int]]:
        """{(stage, partition_id)} already done for this input fingerprint."""
        rows = (
            self.read()
            .filter(F.col("fingerprint") == fingerprint)
            .select("stage", "partition_id")
            .collect()
        )
        return {(r["stage"], r["partition_id"]) for r in rows}

    def record(
        self,
        stage: str,
        partition_id: int,
        fingerprint: str,
        rows_in: int,
        rows_out: int,
        seconds: float,
    ) -> None:
        rate = rows_out / seconds if seconds > 0 else 0.0
        row = [
            (
                stage, partition_id, fingerprint, rows_in, rows_out,
                float(seconds), float(rate), datetime.now(timezone.utc),
            )
        ]
        self.spark.createDataFrame(row, LINEAGE_SCHEMA).write.mode("append").parquet(
            self.path
        )

    def record_many(self, rows: list[tuple]) -> None:
        """Batch append: [(stage, partition_id, fingerprint, rows_in,
        rows_out, seconds), ...] — one parquet append job for N entries."""
        now = datetime.now(timezone.utc)
        data = [
            (
                stage, pid, fp, rin, rout, float(sec),
                float(rout / sec) if sec > 0 else 0.0, now,
            )
            for stage, pid, fp, rin, rout, sec in rows
        ]
        self.spark.createDataFrame(data, LINEAGE_SCHEMA).write.mode(
            "append"
        ).parquet(self.path)

    def metrics(self) -> list[dict]:
        return [r.asDict() for r in self.read().orderBy("completed_at").collect()]


class StageTimer:
    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.seconds = time.time() - self.t0
        return False
