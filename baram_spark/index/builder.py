"""Resumable end-to-end index build orchestration.

Drives the stages in ``build.py`` with per-shard lineage + resume:

    out_dir/
      docs/                 extraction output (parquet)
      doc_terms/shard=K/    tokenized rows, pre-partitioned by term shard
      corpus_stats/         per-field N + avgdl
      term_stats/           per-(field,term) df (salt planning + analytics)
      postings/shard=K/     packed posting lists
      lineage/              the resume + metrics ledger

Each postings shard is an independent Spark job over only its
``doc_terms/shard=K`` files (directory-pruned scan — the checkpoint
prefilter reads no other shard's data, mirroring the reference's
"skip without reading content" property, ``src/commands/index.rs:160-175``).
Shards run concurrently on a small thread pool (FAIR scheduler), the
local-mode stand-in for running shard groups as parallel cluster jobs.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession, functions as F

from .build import (
    CODEC_VARINT,
    build_postings,
    corpus_stats,
    extract_docs,
    plan_salts,
    shard_expr,
    term_stats,
    tokenize_docs,
)
from .lineage import LineageLedger, StageTimer


class IndexBuilder:
    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        n_shards: int = 8,
        salt_threshold: int = 50_000,
        codec: int = CODEC_VARINT,
        shard_concurrency: int = 4,
    ):
        self.spark = spark
        self.out = out_dir.rstrip("/")
        self.n_shards = n_shards
        self.salt_threshold = salt_threshold
        self.codec = codec
        self.shard_concurrency = shard_concurrency
        self.ledger = LineageLedger(spark, f"{self.out}/lineage")

    # -- paths --------------------------------------------------------------
    @property
    def docs_path(self):
        return f"{self.out}/docs"

    @property
    def doc_terms_path(self):
        return f"{self.out}/doc_terms"

    @property
    def corpus_stats_path(self):
        return f"{self.out}/corpus_stats"

    @property
    def term_stats_path(self):
        return f"{self.out}/term_stats"

    @property
    def postings_path(self):
        return f"{self.out}/postings"

    # -- build --------------------------------------------------------------
    def build(self, pages: DataFrame, fingerprint: str, resume: bool = True) -> dict:
        """Run (or resume) the full build; returns throughput metrics."""
        done = self.ledger.completed(fingerprint) if resume else set()
        metrics: dict = {"fingerprint": fingerprint, "resumed_stages": []}

        if ("docs", 0) in done:
            metrics["resumed_stages"].append("docs")
        else:
            with StageTimer() as t:
                n_in = pages.count()
                extract_docs(pages).write.mode("overwrite").parquet(self.docs_path)
                n_out = self.spark.read.parquet(self.docs_path).count()
            self.ledger.record("docs", 0, fingerprint, n_in, n_out, t.seconds)
            metrics["docs_per_sec"] = n_out / t.seconds if t.seconds else 0.0
            metrics["extract_seconds"] = t.seconds
        docs = self.spark.read.parquet(self.docs_path)

        if ("doc_terms", 0) in done:
            metrics["resumed_stages"].append("doc_terms")
        else:
            with StageTimer() as t:
                (
                    tokenize_docs(docs)
                    .withColumn("shard", shard_expr(self.n_shards))
                    .write.mode("overwrite")
                    .partitionBy("shard")
                    .parquet(self.doc_terms_path)
                )
                n_out = self.spark.read.parquet(self.doc_terms_path).count()
            self.ledger.record("doc_terms", 0, fingerprint, 0, n_out, t.seconds)
            metrics["tokenize_seconds"] = t.seconds
        doc_terms = self.spark.read.parquet(self.doc_terms_path)

        if ("stats", 0) in done:
            metrics["resumed_stages"].append("stats")
        else:
            with StageTimer() as t:
                corpus_stats(doc_terms).coalesce(1).write.mode("overwrite").parquet(
                    self.corpus_stats_path
                )
                # term-sorted files → parquet min/max row-group pruning for
                # the query-time `term IN (...)` lookup
                term_stats(doc_terms).sort("term").write.mode("overwrite").parquet(
                    self.term_stats_path
                )
            self.ledger.record("stats", 0, fingerprint, 0, 0, t.seconds)
            metrics["stats_seconds"] = t.seconds

        avgdl_by_field = {
            r["field"]: float(r["avgdl"])
            for r in self.spark.read.parquet(self.corpus_stats_path).collect()
        }
        heavy_pdf = (
            self.spark.read.parquet(self.term_stats_path)
            .filter(F.col("df") > self.salt_threshold)
            .toPandas()
        )
        salt_plan_all = plan_salts(heavy_pdf, self.salt_threshold)

        todo = [
            k for k in range(self.n_shards)
            if ("postings", k) not in done
        ]
        metrics["resumed_shards"] = sorted(
            k for k in range(self.n_shards) if ("postings", k) in done
        )

        def build_shard(k: int) -> tuple[int, int, float]:
            t0 = time.time()
            shard_terms = self.spark.read.parquet(
                f"{self.doc_terms_path}/shard={k}"
            )
            postings = build_postings(
                self.spark, shard_terms, avgdl_by_field, salt_plan_all,
                codec=self.codec,
            )
            # few term-sorted files per shard: fast min/max-pruned lookups.
            # repartition (not coalesce) so the upstream pack/merge stages
            # keep full parallelism — the blobs being shuffled are tiny.
            (
                postings.repartition(4, "term")
                .sortWithinPartitions("field", "term")
                .write.mode("overwrite")
                .parquet(f"{self.postings_path}/shard={k}")
            )
            n_postings = (
                self.spark.read.parquet(f"{self.postings_path}/shard={k}")
                .agg(F.sum("df"))
                .collect()[0][0]
                or 0
            )
            dt = time.time() - t0
            self.ledger.record("postings", k, fingerprint, 0, int(n_postings), dt)
            return k, int(n_postings), dt

        total_postings = 0
        t_post0 = time.time()
        if todo:
            with ThreadPoolExecutor(max_workers=self.shard_concurrency) as pool:
                for k, n_postings, dt in pool.map(build_shard, todo):
                    total_postings += n_postings
        metrics["postings_seconds"] = time.time() - t_post0
        metrics["postings_built"] = total_postings
        if metrics["postings_seconds"] > 0 and total_postings:
            metrics["postings_per_sec"] = (
                total_postings / metrics["postings_seconds"]
            )
        return metrics
