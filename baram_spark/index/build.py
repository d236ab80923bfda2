"""Index build pipeline: pages → docs → doc_terms → sharded postings.

The Spark-native analog of ``baram index`` (``/root/reference/src/commands/
index.rs:36-359``), re-architected for 10^12-doc scale:

    pages ──extract UDF──▶ docs            (narrow; no shuffle)
    docs  ──analyze UDF──▶ doc_terms       (narrow; tf+dl computed in-batch)
    doc_terms ─groupBy(field,term[,salt])─▶ packed postings   (THE shuffle)
    salted heavy terms ──groupBy(field,term)──▶ merged postings

Scale levers, explicit per the north_rule:

- **Sharding**: postings land in ``n_shards`` directories keyed by
  ``shard = pmod(xxhash64(field, term), n_shards)`` (the OpenSearch
  ``number_of_shards`` analog, ``src/embedding/mod.rs:241``); a query term
  prunes to exactly one shard directory.
- **Skew**: Zipf-head terms (df above ``salt_threshold``, detected from a
  cheap term_stats aggregation) get a salt ``pmod(xxhash64(doc_id), k)``
  so no single reducer receives the head term's full posting set. The merge
  stage re-groups only the salted terms — by then they are compact packed
  blobs (~3 bytes/posting), 1-2 orders of magnitude smaller than rows.
- **Map-side pre-aggregation**: tf and dl are computed inside the tokenize
  batch (one row per (doc, field, term) leaves the mapper — never one row
  per token).
- **Resume**: each shard's postings build is an independent job recording a
  lineage row; re-runs skip shards already present (see lineage.py), the
  analog of Baram's checkpoint id-prefilter (``src/commands/index.rs:160-194``).
"""

from __future__ import annotations

import time
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..textproc.analyzer import analyze_index
from ..textproc.extract import extract_batch
from .codec import CODEC_VARINT, decode_postings, encode_postings

DOCS_SCHEMA = (
    "doc_id long, url string, oid string, aid string, title string, "
    "text string, category string, published_at timestamp, publisher string, "
    "author string, format string, content_hash string"
)

DOC_TERMS_SCHEMA = "doc_id long, field string, term string, tf int, dl int"

POSTINGS_SCHEMA = (
    "field string, term string, salt int, df long, "
    "postings bytes, skips bytes, blockmax bytes"
)
POSTINGS_SCHEMA_SPARK = (
    "field string, term string, salt int, df long, "
    "postings binary, skips binary, blockmax binary"
)


def extract_docs(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, ...) → docs; deleted/unparseable dropped.

    One narrow stage: the Arrow-batched extraction UDF (E1-E16 +
    sanitize chain) runs where the scan runs — no shuffle.
    """
    cols = pages.columns

    def run(iterator):
        for pdf in iterator:
            out = extract_batch(pdf["html"], pdf["url"])
            out["warc_ts"] = pdf["warc_ts"].values
            out["lang"] = pdf["lang"].values if "lang" in pdf else None
            yield out

    schema = DOCS_SCHEMA + ", warc_ts timestamp, lang string"
    sel = [c for c in ("url", "warc_ts", "html", "lang") if c in cols]
    return (
        pages.select(*sel)
        .mapInPandas(run, schema=schema)
        .filter(F.col("text").isNotNull())
    )


def tokenize_docs(docs: DataFrame) -> DataFrame:
    """docs → doc_terms(doc_id, field, term, tf, dl).

    tf and dl are computed inside the Arrow batch (map-side combine before
    the shuffle even sees the data). Output is one row per distinct
    (doc, field, term) — the minimal shuffle payload.
    """

    def run(iterator):
        for pdf in iterator:
            rows_doc, rows_field, rows_term, rows_tf, rows_dl = [], [], [], [], []
            for doc_id, title, text in zip(
                pdf["doc_id"].tolist(), pdf["title"].tolist(), pdf["text"].tolist()
            ):
                for fname, ftext in (("title", title), ("content", text)):
                    tokens = analyze_index(ftext or "")
                    if not tokens:
                        continue
                    dl = len(tokens)
                    for term, tf in Counter(tokens).items():
                        rows_doc.append(doc_id)
                        rows_field.append(fname)
                        rows_term.append(term)
                        rows_tf.append(tf)
                        rows_dl.append(dl)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows_doc, dtype="int64"),
                    "field": rows_field,
                    "term": rows_term,
                    "tf": pd.Series(rows_tf, dtype="int32"),
                    "dl": pd.Series(rows_dl, dtype="int32"),
                }
            )

    return docs.select("doc_id", "title", "text").mapInPandas(
        run, schema=DOC_TERMS_SCHEMA
    )


def corpus_stats(doc_terms: DataFrame) -> DataFrame:
    """Per-field (n_docs, avgdl) — BM25 denominators."""
    per_doc = doc_terms.groupBy("field", "doc_id").agg(F.first("dl").alias("dl"))
    return per_doc.groupBy("field").agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*")).cast("double").alias("avgdl"),
    )


def term_stats(doc_terms: DataFrame) -> DataFrame:
    """Per (field, term) document frequency — salt planning + idf."""
    return doc_terms.groupBy("field", "term").agg(F.count("*").alias("df"))


def plan_salts(term_stats_pdf: pd.DataFrame, salt_threshold: int) -> dict:
    """Driver-side salt planner: heavy (field,term) → salt factor k.

    k = ceil(df / salt_threshold) capped at 64 — each salted reducer handles
    at most ~salt_threshold postings.
    """
    heavy = term_stats_pdf[term_stats_pdf["df"] > salt_threshold]
    return {
        (r.field, r.term): min(int(np.ceil(r.df / salt_threshold)), 64)
        for r in heavy.itertuples()
    }


def _pack_group(avgdl_by_field: dict, codec: int):
    """applyInPandas packer for one (field, term, salt) group."""

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        field, term, salt = key
        order = np.argsort(pdf["doc_id"].values, kind="stable")
        ids = pdf["doc_id"].values[order].astype(np.int64)
        tfs = pdf["tf"].values[order].astype(np.int64)
        dls = pdf["dl"].values[order].astype(np.int64)
        blob, skips, bmax = encode_postings(
            ids, tfs, dls, avgdl=avgdl_by_field[field], codec=codec
        )
        return pd.DataFrame(
            {
                "field": [field], "term": [term], "salt": [int(salt)],
                "df": [len(ids)], "postings": [blob], "skips": [skips],
                "blockmax": [bmax],
            }
        )

    return pack


def _merge_group(avgdl_by_field: dict, codec: int):
    """applyInPandas merger: salted partial blobs of one term → one blob.

    Decodes k compact partials (numpy), merge-sorts by doc_id, re-encodes.
    Input here is ~3 bytes/posting instead of full rows — the whole point
    of salting the heavy terms.
    """

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        field, term = key
        if len(pdf) == 1:
            row = pdf.iloc[0]
            return pd.DataFrame(
                {
                    "field": [field], "term": [term], "salt": [0],
                    "df": [int(row["df"])], "postings": [row["postings"]],
                    "skips": [row["skips"]], "blockmax": [row["blockmax"]],
                }
            )
        ids_l, tfs_l, dls_l = [], [], []
        for _, row in pdf.iterrows():
            ids, tfs, dls = decode_postings(bytes(row["postings"]), bytes(row["skips"]))
            ids_l.append(ids)
            tfs_l.append(tfs)
            dls_l.append(dls)
        ids = np.concatenate(ids_l)
        tfs = np.concatenate(tfs_l)
        dls = np.concatenate(dls_l)
        order = np.argsort(ids, kind="stable")
        blob, skips, bmax = encode_postings(
            ids[order], tfs[order], dls[order],
            avgdl=avgdl_by_field[field], codec=codec,
        )
        return pd.DataFrame(
            {
                "field": [field], "term": [term], "salt": [0],
                "df": [len(ids)], "postings": [blob], "skips": [skips],
                "blockmax": [bmax],
            }
        )

    return merge


def shard_expr(n_shards: int):
    """shard = pmod(xxhash64(doc_id), n_shards) — DOCUMENT sharding.

    Each document lives in exactly one shard (the OpenSearch/Lucene shard
    model, ``src/embedding/mod.rs:241``), so a shard holds postings of ALL
    query terms for its doc subset: per-shard BM25 scores are complete and
    the global top-k is exactly the k-merge of per-shard top-ks.
    """
    return F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_shards))


def build_postings(
    spark: SparkSession,
    doc_terms: DataFrame,
    avgdl_by_field: dict,
    salt_plan: dict,
    codec: int = CODEC_VARINT,
) -> DataFrame:
    """doc_terms (of ONE doc-shard) → packed postings (salting + merge)."""
    if not salt_plan:
        return doc_terms.withColumn("salt", F.lit(0)).groupBy(
            "field", "term", "salt"
        ).applyInPandas(_pack_group(avgdl_by_field, codec), schema=POSTINGS_SCHEMA_SPARK)

    plan_pdf = pd.DataFrame(
        [(f, t, k) for (f, t), k in salt_plan.items()],
        columns=["field", "term", "salt_k"],
    )
    plan_df = F.broadcast(spark.createDataFrame(plan_pdf))
    tagged = doc_terms.join(plan_df, ["field", "term"], "left")

    # Light terms: one group each, no salt, no merge pass.
    light = (
        tagged.filter(F.col("salt_k").isNull())
        .withColumn("salt", F.lit(0))
        .groupBy("field", "term", "salt")
        .applyInPandas(_pack_group(avgdl_by_field, codec), schema=POSTINGS_SCHEMA_SPARK)
    )
    # Heavy terms: salted partial packs, then a blob-level merge — the
    # second shuffle moves ~3 bytes/posting instead of full rows.
    heavy = (
        tagged.filter(F.col("salt_k").isNotNull())
        .withColumn(
            "salt", F.pmod(F.xxhash64(F.col("doc_id")), F.col("salt_k")).cast("int")
        )
        .groupBy("field", "term", "salt")
        .applyInPandas(_pack_group(avgdl_by_field, codec), schema=POSTINGS_SCHEMA_SPARK)
        .groupBy("field", "term")
        .applyInPandas(_merge_group(avgdl_by_field, codec), schema=POSTINGS_SCHEMA_SPARK)
    )
    return light.unionByName(heavy)
