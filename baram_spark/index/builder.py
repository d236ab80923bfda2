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
    extract_docs,
    plan_salts,
    shard_expr,
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
        shard_concurrency: int = 2,
        shards_per_job: int | None = None,
    ):
        self.spark = spark
        self.out = out_dir.rstrip("/")
        self.n_shards = n_shards
        self.salt_threshold = salt_threshold
        self.codec = codec
        self.shard_concurrency = shard_concurrency
        # fresh builds: few big jobs (full parallelism); resume rebuilds are
        # naturally small. Default: half the shards per job.
        self.shards_per_job = shards_per_job or max(n_shards // 2, 1)
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

        from pyspark.sql import Observation

        if ("docs", 0) in done:
            metrics["resumed_stages"].append("docs")
        else:
            obs = Observation("docs")
            with StageTimer() as t:
                (
                    extract_docs(pages)
                    .observe(obs, F.count(F.lit(1)).alias("rows"))
                    .write.mode("overwrite")
                    .parquet(self.docs_path)
                )
                n_out = int(obs.get["rows"])
            self.ledger.record("docs", 0, fingerprint, 0, n_out, t.seconds)
            metrics["docs_per_sec"] = n_out / t.seconds if t.seconds else 0.0
            metrics["extract_seconds"] = t.seconds
        docs = self.spark.read.parquet(self.docs_path)

        if ("doc_terms", 0) in done:
            metrics["resumed_stages"].append("doc_terms")
        else:
            # corpus_stats (per-field N + avgdl) rides along as write
            # observations on the `first` flag — no separate pass over the
            # 10-100x-larger doc_terms table.
            obs = Observation("doc_terms")
            obs_aggs = [F.count(F.lit(1)).alias("rows")]
            for f in ("title", "content"):
                cond = F.col("field") == f
                obs_aggs.append(
                    F.sum(F.when(cond, F.col("first")).otherwise(0)).alias(f"n_{f}")
                )
                obs_aggs.append(
                    F.sum(
                        F.when(cond, F.col("dl") * F.col("first")).otherwise(0)
                    ).alias(f"dl_{f}")
                )
            with StageTimer() as t:
                (
                    tokenize_docs(docs)
                    .withColumn("shard", shard_expr(self.n_shards))
                    .observe(obs, *obs_aggs)
                    .write.mode("overwrite")
                    .partitionBy("shard")
                    .parquet(self.doc_terms_path)
                )
                got = obs.get
                n_out = int(got["rows"])
                stats_rows = [
                    (f, int(got[f"n_{f}"] or 0),
                     float(got[f"dl_{f}"] or 0) / max(int(got[f"n_{f}"] or 0), 1))
                    for f in ("title", "content")
                ]
                self.spark.createDataFrame(
                    stats_rows, "field string, n_docs long, avgdl double"
                ).coalesce(1).write.mode("overwrite").parquet(self.corpus_stats_path)
            self.ledger.record("doc_terms", 0, fingerprint, 0, n_out, t.seconds)
            metrics["tokenize_seconds"] = t.seconds
        doc_terms = self.spark.read.parquet(self.doc_terms_path)

        avgdl_by_field = {
            r["field"]: float(r["avgdl"])
            for r in self.spark.read.parquet(self.corpus_stats_path).collect()
        }
        # salt planning needs only the Zipf head — a 5% sample finds it at
        # 1/20th the cost; df estimates scale back up by 1/fraction.
        frac = 0.05
        sample_counts = (
            doc_terms.sample(fraction=frac, seed=42)
            .groupBy("field", "term")
            .agg((F.count("*") / frac).cast("long").alias("df"))
            .filter(F.col("df") > self.salt_threshold)
            .toPandas()
        )
        salt_plan_all = plan_salts(sample_counts, self.salt_threshold)

        todo = [
            k for k in range(self.n_shards)
            if ("postings", k) not in done
        ]
        metrics["resumed_shards"] = sorted(
            k for k in range(self.n_shards) if ("postings", k) in done
        )

        # group the pending shards: a fresh build runs few big jobs at full
        # cluster parallelism; a partial resume rebuilds exactly the missing
        # shards (possibly one per group). Lineage stays per-shard either way.
        groups = [
            todo[i : i + self.shards_per_job]
            for i in range(0, len(todo), self.shards_per_job)
        ]
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

        from pyspark.sql import Observation

        def build_group(shard_ids: list[int]) -> int:
            t0 = time.time()
            shard_terms = (
                self.spark.read.option("basePath", self.doc_terms_path)
                .parquet(*[f"{self.doc_terms_path}/shard={k}" for k in shard_ids])
            )
            postings = build_postings(
                self.spark, shard_terms, avgdl_by_field, salt_plan_all,
                codec=self.codec,
            )
            # few term-sorted files per shard: fast min/max-pruned lookups.
            # repartition (not coalesce) so the upstream pack/merge stages
            # keep full parallelism — the blobs being shuffled are tiny.
            # Per-shard posting counts ride along as write observations
            # (no read-back job).
            obs = Observation(f"postings-{shard_ids[0]}")
            (
                postings.repartition(4 * len(shard_ids), "shard", "term")
                .sortWithinPartitions("field", "term")
                .observe(
                    obs,
                    *[
                        F.sum(
                            F.when(F.col("shard") == k, F.col("df")).otherwise(0)
                        ).alias(f"n{k}")
                        for k in shard_ids
                    ],
                )
                .write.mode("overwrite")
                .partitionBy("shard")
                .parquet(self.postings_path)
            )
            dt = time.time() - t0
            got = obs.get
            counts = {k: int(got[f"n{k}"] or 0) for k in shard_ids}
            per_shard_dt = dt / max(len(shard_ids), 1)
            self.ledger.record_many(
                [
                    ("postings", k, fingerprint, 0, counts.get(k, 0), per_shard_dt)
                    for k in shard_ids
                ]
            )
            return sum(counts.values())

        total_postings = 0
        t_post0 = time.time()
        if groups:
            with ThreadPoolExecutor(max_workers=self.shard_concurrency) as pool:
                for n_postings in pool.map(build_group, groups):
                    total_postings += n_postings
        metrics["postings_seconds"] = time.time() - t_post0
        metrics["postings_built"] = total_postings
        if metrics["postings_seconds"] > 0 and total_postings:
            metrics["postings_per_sec"] = (
                total_postings / metrics["postings_seconds"]
            )

        # exact global term_stats (query-time idf) from the packed rows —
        # (n_terms × n_shards) rows, 1-2 orders smaller than doc_terms.
        if ("term_stats", 0) in done:
            metrics["resumed_stages"].append("term_stats")
        else:
            with StageTimer() as t:
                (
                    self.spark.read.parquet(self.postings_path)
                    .groupBy("field", "term")
                    .agg(F.sum("df").alias("df"))
                    .sort("term")
                    .write.mode("overwrite")
                    .parquet(self.term_stats_path)
                )
            self.ledger.record("term_stats", 0, fingerprint, 0, 0, t.seconds)
            metrics["term_stats_seconds"] = t.seconds
        return metrics
