"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the SQL-checkable operator surface from SURVEY.md §2
(windows/aggregations G1-G10, joins J1-J5 analogs, dedup I8/I10, the BM25
scoring pipeline Q1 re-expressed over the provided ``documents`` table, plus
the training-data-pipeline operators: minhash/LSH/jaccard dedup, cosine kNN,
text quality/langid/fingerprinting). ``oracle_sql()`` carries the equivalent
DuckDB SQL; floats are rounded to 6 dp on BOTH sides and columns share names
exactly so the driver's order-insensitive value-hash matches.

The full crawl→extract→index→search engine (HTML byte-identical extraction,
sharded posting lists, block-max WAND) is exercised by ``entry()``/pytest/
bench.py on the synthetic pages corpus — see baram_spark/ and tests/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

BM25_QUERY_TERMS = ["spark", "data"]
K1, B = 1.2, 0.75


_SCAN_INFO_CACHE: dict = {}


def _scan_info(path: str) -> tuple[int, int]:
    """(total_bytes, parquet_row_groups) for a parquet file/dir — cached.

    Row groups, not byte splits, are parquet's real split granularity:
    a 6 MB single-row-group file "splits" into N byte-range tasks of
    which N-1 decode nothing."""
    if path in _SCAN_INFO_CACHE:
        return _SCAN_INFO_CACHE[path]
    import glob
    import os
    try:
        files = ([path] if os.path.isfile(path)
                 else sorted(glob.glob(os.path.join(path, "*.parquet"))))
        if not files:
            # partitioned/nested layout or non-.parquet names: footer
            # counting doesn't apply — assume big, never repartition
            raise FileNotFoundError(path)
        nbytes = sum(os.path.getsize(f) for f in files)
        ngroups = 0
        import pyarrow.parquet as pq
        for f in files[:64]:  # ≥64 groups is plenty; stop counting
            ngroups += pq.ParquetFile(f).metadata.num_row_groups
        if len(files) > 64:
            ngroups = max(ngroups, len(files))
    except Exception:
        # non-local FS / unreadable footer: assume big, never repartition
        nbytes, ngroups = 1 << 62, 1 << 20
    _SCAN_INFO_CACHE[path] = (nbytes, ngroups)
    return nbytes, ngroups


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _tw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a table and widen an under-parallelized small scan.

    The driver's generated tables are single (or few-) row-group parquet
    files, so the scan — and every NARROW operator fused onto it
    (tokenize explodes, regex features, per-doc arrays) — runs in 1-6
    tasks on a 32-core box. When effective scan parallelism is below
    half the cores AND the whole input is small enough that an exchange
    is trivially cheap (≤ 64 MB), repartition round-robin right after
    the scan: the compute then fans out to 2× cores (language_id at
    sf1.0: 4.8 s → 0.8 s). Both gates are scale-adaptive: a production
    table has thousands of row groups (no repartition, plan unchanged)
    and anything big enough for the exchange to matter fails the bytes
    gate (measured: repartitioning 131 MB lineitem made tpch_q1
    0.85 s → 2.4 s).

    ONLY for queries whose results are partition-order-insensitive:
    per-row projections, integer/count/min/bit aggregations, exact
    integer-valued sums, or aggregations whose input order is normalized
    by a window sort. Queries that round large FLOAT sums (tpch revenue,
    avg_value, sessionize's value_sum) keep the plain scan: their 6-dp
    rounding sits at the accumulated-ulp boundary, so reordering the sum
    can flip the last digit (observed: tpch_q1 at sf0.01)."""
    df = _t(spark, sf_dir, name)
    dp = spark.sparkContext.defaultParallelism
    nbytes, ngroups = _scan_info(f"{sf_dir}/{name}.parquet")
    if ngroups < max(dp // 2, 1) and nbytes <= (64 << 20):
        return df.repartition(dp * 2)
    return df


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: whitespace-analyzed BM25 top-10 over sf0.001 documents."""
    return _bm25_topk(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# search pipeline over `documents` (whitespace analyzer → SQL-checkable)
# ---------------------------------------------------------------------------

def _doc_tokens(spark, sf_dir, wide: bool = True):
    # wide=False for consumers whose downstream work is too light to pay
    # for the widening exchange (corpus_stats: one count-per-doc agg)
    docs = (_tw if wide else _t)(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")


def _doc_tf(spark, sf_dir):
    return (
        _doc_tokens(spark, sf_dir)
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def _term_df(spark, sf_dir):
    return (
        _doc_tf(spark, sf_dir)
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
    )


def _corpus_stats(spark, sf_dir):
    # plain scan: the count-per-doc aggregate partial-aggregates in the
    # scan tasks; widening measured 2-3x slower (sf1.0 A/B: 0.5-0.8 s
    # plain vs 1.4-1.9 s widened)
    dl = (
        _doc_tokens(spark, sf_dir, wide=False)
        .groupBy("doc_id")
        .agg(F.count("*").alias("dl"))
    )
    return dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("dl"), 6).alias("avgdl"),
    )


_BM25_SCORES_CACHE: dict = {}


def _bm25_scores(spark, sf_dir):
    """Full (doc_id, score) BM25 relation — no ordering, no limit.

    ONE tokenize pass and ONE shuffle: a single groupBy(doc_id) yields
    dl (Σ tokens per doc — exactly Σ tf) AND the per-query-term tf
    columns (sum of per-term indicators ≡ q_doc_tf's count for those
    terms, so the scoring path cannot diverge from the SQL-checkable
    relation). Corpus stats and per-term df then come from one tiny
    aggregate over that 1-row-per-doc relation, pulled to the driver as
    literals, and the score is a join-free projection: w(term) with
    tf = 0 contributes idf·0/(0+k) = exactly 0.0, and two-term float
    addition is commutative, so scores are bit-identical to the r5
    tf-join-df-join-dl-join-stats plan (which cached and re-walked the
    full 2.3M-row tf relation: 6.5 s → 2.9 s at sf1.0). The per-doc
    relation is cached and the scores DF memoized per (session, sf_dir)
    so bm25_topk and bm25_topk_filtered share one materialization."""
    # keyed by applicationId, not id(spark): a stopped session's CPython
    # id can be reused by a new one, which would hand back DataFrames
    # bound to a dead SparkContext
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _BM25_SCORES_CACHE:
        return _BM25_SCORES_CACHE[key]
    toks = _doc_tokens(spark, sf_dir)
    tf_cols = [
        F.sum(F.when(F.col("term") == t, 1).otherwise(0))
        .cast("int").alias(f"tf_{i}")
        for i, t in enumerate(BM25_QUERY_TERMS)
    ]
    docrel = toks.groupBy("doc_id").agg(
        F.count("*").alias("dl"), *tf_cols
    ).cache()
    stat = docrel.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"),
        *[F.count(F.when(F.col(f"tf_{i}") > 0, F.lit(1))).alias(f"df_{i}")
          for i in range(len(BM25_QUERY_TERMS))],
    ).first()
    n_docs = stat["n_docs"]
    avgdl = stat["avgdl"] if stat["avgdl"] is not None else 1.0
    any_term = None
    score = None
    for i in range(len(BM25_QUERY_TERMS)):
        df_i = stat[f"df_{i}"]
        idf = F.log(
            F.lit(1.0)
            + (F.lit(n_docs) - F.lit(df_i) + 0.5) / (F.lit(df_i) + 0.5)
        )
        tf_c = F.col(f"tf_{i}")
        w = idf * tf_c / (
            tf_c + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl))
        )
        score = w if score is None else score + w
        has = tf_c > 0
        any_term = has if any_term is None else (any_term | has)
    out = docrel.filter(any_term).select(
        "doc_id", F.round(score, 6).alias("score")
    )
    _BM25_SCORES_CACHE[key] = out
    return out


def _bm25_topk(spark, sf_dir, k: int = 10):
    return (
        _bm25_scores(spark, sf_dir)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _bm25_topk_filtered(spark, sf_dir, k: int = 10):
    """Filter-context BM25 (the engine's category/date semantics on the
    SQL-checkable demo path): candidates restricted to lang='en' docs, but
    df/avgdl stay full-corpus — scores identical to the unfiltered query."""
    allowed = _t(spark, sf_dir, "documents").filter(
        F.col("lang") == "en"
    ).select("doc_id")
    return (
        _bm25_scores(spark, sf_dir)
        .join(F.broadcast(allowed), "doc_id", "left_semi")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), toks2 AS (
  SELECT doc_id, term FROM toks WHERE term <> ''
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY 1
), stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), q AS (
  SELECT unnest(['{BM25_QUERY_TERMS[0]}', '{BM25_QUERY_TERMS[1]}']) AS term
)
SELECT tf.doc_id,
       ROUND(SUM(
         ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
         * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
       ), 6) AS score
FROM tf
JOIN q USING (term)
JOIN df USING (term)
JOIN dl ON tf.doc_id = dl.doc_id
CROSS JOIN stats
GROUP BY tf.doc_id
ORDER BY score DESC, tf.doc_id ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from baram_spark.operators import dedup, similarity, text_analysis, trends

    def events_series(spark, sf_dir):
        # NOT widened: daily_counts partial-aggregates 1M rows to ~150 in
        # the scan tasks; a pre-exchange is pure overhead (measured: the
        # series family ran 2.5-3.2 s widened vs 0.6-1.4 s plain at sf1.0)
        return trends.daily_counts(_t(spark, sf_dir, "events"))

    def q_doc_tf(spark, sf_dir):
        return _doc_tf(spark, sf_dir)

    def q_term_df(spark, sf_dir):
        return _term_df(spark, sf_dir)

    def q_corpus_stats(spark, sf_dir):
        return _corpus_stats(spark, sf_dir)

    def q_bm25(spark, sf_dir):
        return _bm25_topk(spark, sf_dir)

    def q_bm25_filtered(spark, sf_dir):
        return _bm25_topk_filtered(spark, sf_dir)

    def q_moving_avg(spark, sf_dir):
        out = trends.moving_average(events_series(spark, sf_dir))
        return out.select(
            "key", F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("cnt").cast("long").alias("cnt"), "moving_avg",
        )

    def q_spikes(spark, sf_dir):
        out = trends.detect_spikes(events_series(spark, sf_dir), threshold=1.1)
        return out.select(
            "key", F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("cnt").cast("long").alias("cnt"), "magnitude", "zscore",
        )

    def q_trend_slope(spark, sf_dir):
        return trends.trend_slope(events_series(spark, sf_dir))

    def q_pct_change(spark, sf_dir):
        out = trends.percent_change(events_series(spark, sf_dir))
        return out.select(
            "key", F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("cnt").cast("long").alias("cnt"), "pct_change",
        )

    def q_minmax(spark, sf_dir):
        out = trends.minmax_normalize(events_series(spark, sf_dir))
        return out.select(
            "key", F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("cnt").cast("long").alias("cnt"), "normalized",
        )

    def q_top_trending(spark, sf_dir):
        out = trends.top_trending(events_series(spark, sf_dir), k=3)
        return out.select("rank", "key", F.col("total").cast("long").alias("total"))

    def q_range_count(spark, sf_dir):
        return trends.range_count(
            _t(spark, sf_dir, "events"), "2024-01-05", "2024-01-20"
        ).select("key", F.col("cnt").cast("long").alias("cnt"))

    def q_avg_value(spark, sf_dir):
        return trends.avg_metric(_t(spark, sf_dir, "events"))

    def q_pmi(spark, sf_dir):
        ents = _doc_tokens(spark, sf_dir).filter(
            F.col("term").isin("spark", "data", "query", "join", "filter")
        ).select("doc_id", F.col("term").alias("entity"))
        return trends.pmi_cooccurrence(ents, min_pairs=2)

    def q_json_extract(spark, sf_dir):
        ev = _tw(spark, sf_dir, "events")
        return (
            ev.select(
                F.get_json_object("props", "$.k").cast("long").alias("k_val")
            )
            .groupBy("k_val")
            .agg(F.count("*").cast("long").alias("cnt"))
        )

    def q_dedup_exact(spark, sf_dir):
        # NOT widened: md5+groupBy per doc is light; moving the full
        # text column through an exchange measured 3x slower (sf1.0
        # A/B: 0.3-0.4 s plain vs 1.1-1.5 s widened)
        return dedup.exact_dedup(_t(spark, sf_dir, "documents")).select(
            "content_hash",
            F.col("canonical_id").cast("long").alias("canonical_id"),
            F.col("n_dups").cast("long").alias("n_dups"),
        )

    def q_anti_join(spark, sf_dir):
        orders = _t(spark, sf_dir, "orders")
        lineitem = _t(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey")
        )
        return dedup.anti_join_new(orders, lineitem, key="o_orderkey").select(
            "o_orderkey", "o_orderstatus"
        )

    def _shingle_tokens(spark, sf_dir):
        # NO (doc_id, term) distinct: every consumer below aggregates with
        # duplicate-idempotent functions (min / bit_or / count_distinct /
        # collect_set), so the r5 pre-distinct exchange over the token
        # stream bought nothing — identical results, one less shuffle
        return _doc_tokens(spark, sf_dir).select(
            "doc_id", F.col("term").alias("shingle")
        )

    def q_minhash(spark, sf_dir):
        return dedup.minhash_signatures(
            _shingle_tokens(spark, sf_dir), n_hashes=4)

    def q_lsh_pairs(spark, sf_dir):
        sig = dedup.minhash_signatures(
            _shingle_tokens(spark, sf_dir), n_hashes=4)
        return dedup.lsh_candidate_pairs(sig, n_hashes=4, bands=2)

    def q_jaccard(spark, sf_dir):
        # LSH-gated exact verifier, fused: candidate generation and exact
        # Jaccard verification in ONE streaming join over per-doc features
        # (signature + shingle bitmask + set size) — no exchange or Python
        # boundary ever carries the ~n² pair stream; falls back to the
        # composed banded-join + Arrow-kernel plan when the fused gates
        # fail (see dedup.lsh_gated_jaccard). The ungated all-pairs form
        # is a scale-killer (O(n²) shingle self-join) and lives only in
        # small-n pytest (tests/test_dedup_ops.py).
        return dedup.lsh_gated_jaccard(
            _shingle_tokens(spark, sf_dir),
            n_hashes=4, bands=2, threshold=0.5)

    def q_simhash(spark, sf_dir):
        return dedup.simhash(_tw(spark, sf_dir, "documents"), bits=16)

    def q_knn(spark, sf_dir):
        emb = _tw(spark, sf_dir, "embeddings")
        qvec = emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv")
        )
        joined = emb.crossJoin(F.broadcast(qvec))
        scored = joined.select(
            "vec_id",
            F.round(
                similarity.cosine_expr(
                    F.transform("embedding", lambda x: x.cast("double")),
                    F.transform("qv", lambda x: x.cast("double")),
                ),
                6,
            ).alias("cosine"),
        )
        from pyspark.sql import Window

        w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .select("rank", "vec_id", "cosine")
        )

    def q_token_counts(spark, sf_dir):
        # NOT widened: split/length counting is light per row; the text
        # exchange measured slower (sf1.0 A/B: 1.9-2.3 s plain vs
        # 2.8-2.9 s widened)
        return text_analysis.token_counts(_t(spark, sf_dir, "documents")).select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_words").cast("long").alias("n_words"),
            F.col("n_chars").cast("long").alias("n_chars"),
        )

    def q_quality(spark, sf_dir):
        return text_analysis.quality_scores(_tw(spark, sf_dir, "documents")).select(
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "punct_ratio", "avg_word_len", "uniq_ratio",
        )

    def q_fingerprint(spark, sf_dir):
        return text_analysis.fingerprint(_tw(spark, sf_dir, "documents"))

    def q_language_id(spark, sf_dir):
        return text_analysis.language_id(_tw(spark, sf_dir, "documents"))

    def q_chunking(spark, sf_dir):
        # window small enough that sf docs actually produce several chunks
        from baram_spark.textproc.chunking import chunk_docs

        return chunk_docs(
            _tw(spark, sf_dir, "documents"), max_tokens=16,
            overlap_tokens=4, min_chunk_tokens=6,
        ).select("doc_id", "chunk_index", "total_chunks", "chunk_text",
                 "token_count")

    def q_tpch_q1(spark, sf_dir):
        li = _t(spark, sf_dir, "lineitem")
        return (
            li.filter(F.col("l_shipdate") <= F.lit("2024-09-01"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
                ).alias("sum_disc_price"),
                F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                F.count("*").cast("long").alias("count_order"),
            )
        )

    def q_hybrid(spark, sf_dir):
        """Q4 hybrid fusion: BM25 top-20 (documents) ⊕ cosine top-20
        (embeddings, vec_id≡doc_id) → min-max normalize each list,
        0.3/0.7 weighted mean, top-10 (reference weights CLAUDE.md:377-386)."""
        from pyspark.sql import Window

        bm25 = _bm25_topk(spark, sf_dir, k=20)
        emb = _tw(spark, sf_dir, "embeddings")
        qvec = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
        knn = (
            emb.crossJoin(F.broadcast(qvec))
            .select(
                F.col("vec_id").alias("doc_id"),
                similarity.cosine_expr(
                    F.transform("embedding", lambda x: x.cast("double")),
                    F.transform("qv", lambda x: x.cast("double")),
                ).alias("kscore"),
            )
            .withColumn(
                "rank",
                F.row_number().over(Window.orderBy(F.desc("kscore"), F.asc("doc_id"))),
            )
            .filter(F.col("rank") <= 20)
            .drop("rank")
        )
        wb = Window.partitionBy()
        bn = bm25.withColumn(
            "nb",
            F.when(
                F.max("score").over(wb) > F.min("score").over(wb),
                (F.col("score") - F.min("score").over(wb))
                / (F.max("score").over(wb) - F.min("score").over(wb)),
            ).otherwise(F.lit(1.0)),
        ).select("doc_id", "nb")
        kn = knn.withColumn(
            "nk",
            F.when(
                F.max("kscore").over(wb) > F.min("kscore").over(wb),
                (F.col("kscore") - F.min("kscore").over(wb))
                / (F.max("kscore").over(wb) - F.min("kscore").over(wb)),
            ).otherwise(F.lit(1.0)),
        ).select("doc_id", "nk")
        fused = (
            bn.join(kn, "doc_id", "full")
            .select(
                "doc_id",
                F.round(
                    0.3 * F.coalesce("nb", F.lit(0.0))
                    + 0.7 * F.coalesce("nk", F.lit(0.0)),
                    6,
                ).alias("hybrid_score"),
            )
            .orderBy(F.desc("hybrid_score"), F.asc("doc_id"))
            .limit(10)
        )
        return fused

    def q_tpch_q3(spark, sf_dir):
        # r5 shape shuffled BOTH lineitem (6M rows) and orders into a
        # sort-merge join before the broadcast customer filter could
        # reduce anything. Reduce first, then broadcast the reduced side
        # (guide §3.1-3.2): customer(BUILDING) is broadcast into orders
        # (leaving ~20% of orders), and that narrow key set is itself
        # broadcast into lineitem — the 6M-row side never shuffles; the
        # only exchange is the partial-aggregated groupBy(o_orderkey).
        cust = _t(spark, sf_dir, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        ).select("c_custkey")
        orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        li = _t(spark, sf_dir, "lineitem")
        orders_b = orders.join(
            F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
        ).select("o_orderkey")
        return (
            li.join(F.broadcast(orders_b),
                    F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderkey")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
                ).alias("revenue")
            )
            .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
            .limit(10)
        )

    def q_tpch_q5(spark, sf_dir):
        # local-supplier volume. r5 sort-merge-joined lineitem against
        # orders and customer (two 6M-row exchanges) before the
        # region=ASIA filter could prune anything. Reduce first, then
        # broadcast the reduced side (guide §3.1-3.2): ASIA nations →
        # ASIA customers → date-filtered orders of those customers —
        # each step a broadcast — then ONE broadcast join attaches the
        # surviving (order, c_nationkey) pairs to lineitem; the fact
        # table's only exchange is the final tiny groupBy(n_name).
        region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
        nation = _t(spark, sf_dir, "nation")
        cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        supp = _t(spark, sf_dir, "supplier")
        orders = _t(spark, sf_dir, "orders").filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        ).select("o_orderkey", "o_custkey")
        li = _t(spark, sf_dir, "lineitem")
        asia_nation = nation.join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"))
        asia_cust = cust.join(
            F.broadcast(asia_nation.select("n_nationkey")),
            F.col("c_nationkey") == F.col("n_nationkey")
        ).select("c_custkey", "c_nationkey")
        orders_b = orders.join(
            F.broadcast(asia_cust),
            F.col("o_custkey") == F.col("c_custkey")
        ).select("o_orderkey", "c_nationkey")
        return (
            li.join(F.broadcast(orders_b),
                    F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(supp),
                  (F.col("l_suppkey") == F.col("s_suppkey"))
                  & (F.col("c_nationkey") == F.col("s_nationkey")))
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("n_name"))
        )

    def q_tpch_q18(spark, sf_dir):
        # large-volume customers: HAVING over a shuffle-agg, then joins
        big = (
            _t(spark, sf_dir, "lineitem")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("sum_qty"))
            .filter(F.col("sum_qty") > 300)
        )
        orders = _t(spark, sf_dir, "orders")
        cust = _t(spark, sf_dir, "customer")
        return (
            big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(cust, F.col("o_custkey") == F.col("c_custkey"))
            .select(
                "c_name", "c_custkey", "o_orderkey",
                F.col("o_orderdate").alias("orderdate"),
                "o_totalprice",
                F.round("sum_qty", 6).alias("sum_qty"),
            )
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(100)
        )

    def q_tpch_q4(spark, sf_dir):
        # order-priority check: EXISTS over lineitem. A LEFT SEMI join
        # puts the 6M-row lineitem side through a sort-merge shuffle
        # (Spark can only broadcast the BUILD side of a semi join, which
        # here is the big one). Same result with zero lineitem shuffle:
        # broadcast the filtered quarter of orders into an inner join
        # (guide §3.1), then dedup by order key — o_orderpriority is
        # functionally dependent on o_orderkey, so distinct-on-both is
        # the EXISTS set — and count per priority. Counts are integers:
        # no float-order sensitivity. (Schema has no commitdate/
        # receiptdate; the lateness predicate is l_shipdate >
        # o_orderdate.)
        orders = _t(spark, sf_dir, "orders").filter(
            (F.col("o_orderdate") >= "1996-07-01")
            & (F.col("o_orderdate") < "1996-10-01")
        ).select("o_orderkey", "o_orderdate", "o_orderpriority")
        late = _t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_shipdate"
        )
        return (
            late.join(
                F.broadcast(orders),
                (F.col("l_orderkey") == F.col("o_orderkey"))
                & (F.col("l_shipdate") > F.col("o_orderdate")),
            )
            .select("o_orderkey", "o_orderpriority")
            .dropDuplicates(["o_orderkey", "o_orderpriority"])
            .groupBy("o_orderpriority")
            .agg(F.count("*").cast("long").alias("order_count"))
            .orderBy("o_orderpriority")
        )

    def q_tpch_q7(spark, sf_dir):
        # volume shipping between two nations, both directions: the
        # nation dim joins twice (broadcast), revenue bucketed by year
        nation = _t(spark, sf_dir, "nation")
        n1 = nation.select(F.col("n_nationkey").alias("s_nk"),
                           F.col("n_name").alias("supp_nation"))
        n2 = nation.select(F.col("n_nationkey").alias("c_nk"),
                           F.col("n_name").alias("cust_nation"))
        li = _t(spark, sf_dir, "lineitem")
        orders = _t(spark, sf_dir, "orders")
        cust = _t(spark, sf_dir, "customer")
        supp = _t(spark, sf_dir, "supplier")
        pair = (F.col("supp_nation") == "NATION_1") & (
            F.col("cust_nation") == "NATION_2"
        ) | (F.col("supp_nation") == "NATION_2") & (
            F.col("cust_nation") == "NATION_1"
        )
        # r5 sort-merge-joined lineitem⋈orders⋈customer (two 6M-row
        # exchanges) and only then applied the two-nation filter. The
        # pair predicate implies cust_nation ∈ {NATION_1, NATION_2}, so:
        # filter n2 to those two nations → broadcast into customer →
        # broadcast the surviving customers into orders → broadcast the
        # surviving (order, cust_nation) rows into lineitem. The fact
        # table's only exchange is the final 4-group aggregate.
        n2f = n2.filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
        cust_f = cust.select("c_custkey", "c_nationkey").join(
            F.broadcast(n2f), F.col("c_nationkey") == F.col("c_nk")
        ).select("c_custkey", "cust_nation")
        orders_f = orders.select("o_orderkey", "o_custkey").join(
            F.broadcast(cust_f), F.col("o_custkey") == F.col("c_custkey")
        ).select("o_orderkey", "cust_nation")
        return (
            li.join(F.broadcast(orders_f),
                    F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(supp),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
            .filter(pair)
            .groupBy(
                "supp_nation", "cust_nation",
                F.year("l_shipdate").cast("long").alias("l_year"),
            )
            .agg(F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                6,
            ).alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year")
        )

    def q_tpch_q10(spark, sf_dir):
        # returned-item reporting: quarter of orders, returns only,
        # top-20 customers by lost revenue
        orders = _t(spark, sf_dir, "orders").filter(
            (F.col("o_orderdate") >= "1996-10-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        li = _t(spark, sf_dir, "lineitem").filter(
            F.col("l_returnflag") == "R"
        )
        cust = _t(spark, sf_dir, "customer")
        nation = _t(spark, sf_dir, "nation")
        # r5 sort-merge-joined the R-flagged lineitem against orders and
        # customer. Now the filtered quarter of orders broadcasts into
        # lineitem, revenue partial-aggregates by o_custkey (one small
        # exchange), and the customer/nation attributes — functionally
        # dependent on c_custkey — are broadcast-attached AFTER the
        # aggregate, so the grouped set is identical with the fact table
        # never shuffling at full width.
        per_cust = (
            li.join(F.broadcast(orders.select("o_orderkey", "o_custkey")),
                    F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_custkey")
            .agg(F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                6,
            ).alias("revenue"))
        )
        return (
            per_cust.join(
                F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", "c_name", "c_acctbal", "n_name", "revenue")
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20)
        )

    def q_ontology_triples(spark, sf_dir):
        # rule-based ontology triple extraction (src/ontology/ analog) over
        # the deterministic Korean press-style corpus (the sf documents
        # table is English word-soup — the reference's patterns are
        # Korean-press rules, so the engine's own corpus is the faithful
        # input). Regex extraction is not SQL-expressible, but the corpus
        # is a pure function of n_docs, so the oracle is a literal
        # expected-constant table (baram_spark/goldens.py) hash-verified
        # by the driver; semantics are also pinned by
        # tests/test_ontology.py goldens.
        from baram_spark.corpus import ontology_docs
        from baram_spark.operators.ontology import extract_triples

        docs = ontology_docs(spark, 400, partitions=8)
        return (
            extract_triples(docs)
            .groupBy("predicate", "predicate_label")
            .agg(
                F.count(F.lit(1)).alias("n_triples"),
                F.countDistinct("subject").alias("n_subjects"),
                F.round(F.avg("confidence"), 6).alias("avg_confidence"),
            )
            .orderBy("predicate", "predicate_label")
        )

    def q_entity_linking(spark, sf_dir):
        # ontology entity linking (linker.rs analog) over the same
        # deterministic press corpus: extract entities per doc, link to
        # the built-in KB (alias + fuzzy), aggregate mentions per
        # canonical entity. Oracle = literal expected-constant table
        # (baram_spark/goldens.py — the corpus is deterministic), also
        # pinned by tests/test_linker.py goldens.
        from baram_spark.corpus import ontology_docs
        from baram_spark.operators.linker import link_entities

        return (
            link_entities(ontology_docs(spark, 400, partitions=8))
            .groupBy("canonical", "entity_type", "in_knowledge_base")
            .agg(
                F.count(F.lit(1)).alias("mentions"),
                F.countDistinct("doc_id").alias("n_docs"),
                F.max("wikidata").alias("wikidata"),
            )
            .orderBy(F.desc("mentions"), "canonical")
        )

    def q_sessionize(spark, sf_dir):
        # event-time session windows over the events table (native
        # session_window; batch mode — watermark is a no-op). Session
        # closes after 30 min of EVENT-time silence; end = last + gap.
        # Deliberately NOT scan-widened: correctness would hold (the
        # session merge sorts by event time within each key, verified
        # identical at sf0.1/sf0.01 with a widened scan), but the extra
        # exchange feeds straight into the session window's own
        # user_id shuffle and measured SLOWER (sf1.0 A/B: 2.1-2.4 s
        # plain vs 3.3-3.6 s widened).
        from baram_spark.streaming.windows import sessionize_event_time

        return sessionize_event_time(
            _t(spark, sf_dir, "events"), gap_minutes=30
        ).orderBy("user_id", "session_start")

    return {
        "doc_tf": q_doc_tf,
        "sessionize": q_sessionize,
        "term_df": q_term_df,
        "corpus_stats": q_corpus_stats,
        "bm25_topk": q_bm25,
        "bm25_topk_filtered": q_bm25_filtered,
        "moving_average": q_moving_avg,
        "spike_zscore": q_spikes,
        "trend_slope": q_trend_slope,
        "percent_change": q_pct_change,
        "minmax_normalize": q_minmax,
        "top_trending": q_top_trending,
        "range_count": q_range_count,
        "avg_value": q_avg_value,
        "pmi_cooccurrence": q_pmi,
        "json_extract": q_json_extract,
        "dedup_exact": q_dedup_exact,
        "anti_join_dedup": q_anti_join,
        "minhash_signatures": q_minhash,
        "lsh_candidate_pairs": q_lsh_pairs,
        "ngram_jaccard": q_jaccard,
        "simhash": q_simhash,
        "knn_cosine": q_knn,
        "hybrid_topk": q_hybrid,
        "token_counts": q_token_counts,
        "language_id": q_language_id,
        "chunking": q_chunking,
        "quality_scores": q_quality,
        "fingerprint": q_fingerprint,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q4": q_tpch_q4,
        "tpch_q5": q_tpch_q5,
        "tpch_q7": q_tpch_q7,
        "tpch_q10": q_tpch_q10,
        "tpch_q18": q_tpch_q18,
        "ontology_triples": q_ontology_triples,
        "entity_linking": q_entity_linking,
    }


_TOKS = (
    "WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS term "
    "FROM documents), toks2 AS (SELECT doc_id, term FROM toks WHERE term <> '')"
)

_SERIES = (
    "series AS (SELECT event_type AS key, date_trunc('day', ts) AS day, "
    "count(*) AS cnt FROM events GROUP BY 1, 2)"
)


def _mh_expr(seed: int) -> str:
    return (
        f"min(CAST(concat('0x', substring(md5(concat('{seed}|', shingle)), 1, 15)) "
        f"AS BIGINT)) AS mh{seed}"
    )


def oracle_sql() -> dict[str, str]:
    from baram_spark import goldens as _goldens

    mh_cols = ", ".join(_mh_expr(s) for s in range(4))
    # simhash bit-sum columns + signature reassembly (bits=16, seed 0 —
    # mirrors dedup.simhash exactly: per-bit +1/-1 vote over token hashes)
    sh_bits = ", ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(16)
    )
    sh_sig = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN {2 ** j} ELSE 0 END)" for j in range(16)
    )
    return {
        "doc_tf": f"{_TOKS} SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY 1,2",
        # gaps-and-islands sessionization; break on STRICTLY > gap because
        # Spark's session_window merges touching windows (end-exclusive)
        "sessionize": """
            WITH o AS (
              SELECT user_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
            ), s AS (
              SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, value
                                       ROWS UNBOUNDED PRECEDING) AS sid
              FROM o
            )
            SELECT user_id,
                   MIN(ts) AS session_start,
                   MAX(ts) + INTERVAL 30 MINUTE AS session_end,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 6) AS value_sum
            FROM s GROUP BY user_id, sid
            ORDER BY user_id, session_start
        """,
        "term_df": f"""{_TOKS}, tf AS (SELECT doc_id, term FROM toks2 GROUP BY 1,2)
            SELECT term, count(*) AS df FROM tf GROUP BY 1""",
        "corpus_stats": f"""{_TOKS}, dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY 1)
            SELECT count(*) AS n_docs, ROUND(avg(dl), 6) AS avgdl FROM dl""",
        "bm25_topk": _BM25_ORACLE,
        # filter context: candidate set restricted to lang='en', df/avgdl
        # full-corpus (matches SearchEngine's pre-ranking filter semantics)
        "bm25_topk_filtered": _BM25_ORACLE.replace(
            "JOIN dl ON tf.doc_id = dl.doc_id",
            "JOIN dl ON tf.doc_id = dl.doc_id "
            "JOIN (SELECT doc_id FROM documents WHERE lang = 'en') allow "
            "ON tf.doc_id = allow.doc_id",
        ),
        "moving_average": f"""WITH {_SERIES}
            SELECT key, strftime(day, '%Y-%m-%d') AS day, cnt,
                   ROUND(avg(cnt) OVER (PARTITION BY key ORDER BY day
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS moving_avg
            FROM series""",
        "spike_zscore": f"""WITH {_SERIES}, x AS (
              SELECT key, day, cnt,
                     avg(cnt) OVER (PARTITION BY key ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma,
                     avg(cnt) OVER (PARTITION BY key) AS mu,
                     stddev_pop(cnt) OVER (PARTITION BY key) AS sigma,
                     count(*) OVER (PARTITION BY key) AS n_key
              FROM series)
            SELECT key, strftime(day, '%Y-%m-%d') AS day, cnt,
                   ROUND(cnt / ma, 6) AS magnitude,
                   ROUND(CASE WHEN sigma > 0 THEN (cnt - mu) / sigma ELSE 0 END, 6) AS zscore
            FROM x WHERE ma > 0 AND ROUND(cnt / ma, 6) >= 1.1
              AND n_key >= 7""",
        "trend_slope": f"""WITH {_SERIES}, x AS (
              SELECT key, cnt,
                     CAST(row_number() OVER (PARTITION BY key ORDER BY day) AS DOUBLE) AS x
              FROM series),
            agg AS (SELECT key, regr_slope(CAST(cnt AS DOUBLE), x) AS slope,
                           avg(cnt) AS mean_cnt FROM x GROUP BY key),
            v AS (SELECT key, slope,
                     CASE WHEN slope IS NOT NULL THEN
                       least(greatest(CASE WHEN mean_cnt > 0 THEN slope / mean_cnt
                                           ELSE 0 END, -1.0), 1.0)
                     END AS vel
                  FROM agg)
            SELECT key, ROUND(slope, 6) AS slope, ROUND(vel, 6) AS velocity,
                   CASE WHEN slope IS NULL THEN 'insufficient_data'
                        WHEN vel > 0.5 THEN 'rising_fast'
                        WHEN vel > 0.1 THEN 'rising'
                        WHEN vel < -0.5 THEN 'falling_fast'
                        WHEN vel < -0.1 THEN 'falling'
                        ELSE 'stable' END AS direction
            FROM v""",
        "percent_change": f"""WITH {_SERIES}
            SELECT key, strftime(day, '%Y-%m-%d') AS day, cnt,
                   ROUND(CASE WHEN lag(cnt) OVER w > 0
                         THEN (cnt - lag(cnt) OVER w) * 100.0 / lag(cnt) OVER w
                         WHEN lag(cnt) OVER w = 0 THEN 100.0
                         END, 6) AS pct_change
            FROM series WINDOW w AS (PARTITION BY key ORDER BY day)""",
        "minmax_normalize": f"""WITH {_SERIES}
            SELECT key, strftime(day, '%Y-%m-%d') AS day, cnt,
                   ROUND(CASE WHEN max(cnt) OVER w > min(cnt) OVER w
                         THEN CAST(cnt - min(cnt) OVER w AS DOUBLE)
                              / (max(cnt) OVER w - min(cnt) OVER w)
                         ELSE 0.5 END, 6) AS normalized
            FROM series WINDOW w AS (PARTITION BY key)""",
        "top_trending": f"""WITH {_SERIES},
            totals AS (SELECT key, CAST(sum(cnt) AS BIGINT) AS total
                       FROM series GROUP BY key)
            SELECT CAST(row_number() OVER (ORDER BY total DESC, key ASC) AS INT) AS rank,
                   key, total
            FROM totals ORDER BY rank LIMIT 3""",
        "range_count": """SELECT event_type AS key, count(*) AS cnt FROM events
            WHERE ts >= '2024-01-05' AND ts < '2024-01-20' GROUP BY 1""",
        "avg_value": """SELECT event_type AS key, ROUND(avg(value), 6) AS avg_value
            FROM events GROUP BY 1""",
        "pmi_cooccurrence": f"""{_TOKS}, ents AS (
              SELECT DISTINCT doc_id, term AS entity FROM toks2
              WHERE term IN ('spark','data','query','join','filter')),
            n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM ents),
            ec AS (SELECT entity, count(*) AS n FROM ents GROUP BY 1),
            pairs AS (
              SELECT a.entity AS e1, b.entity AS e2, count(*) AS n_ab
              FROM ents a JOIN ents b
                ON a.doc_id = b.doc_id AND a.entity < b.entity
              GROUP BY 1, 2 HAVING count(*) >= 2)
            SELECT e1, e2, n_ab,
                   ROUND(log2((CAST(n_ab AS DOUBLE) / n.n_docs) /
                        ((CAST(ca.n AS DOUBLE) / n.n_docs) *
                         (CAST(cb.n AS DOUBLE) / n.n_docs))), 6) AS pmi
            FROM pairs
            JOIN ec ca ON ca.entity = e1
            JOIN ec cb ON cb.entity = e2
            CROSS JOIN n""",
        "json_extract": """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
                   count(*) AS cnt FROM events GROUP BY 1""",
        "dedup_exact": """SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id,
                   count(*) AS n_dups FROM documents GROUP BY 1""",
        "anti_join_dedup": """SELECT o_orderkey, o_orderstatus FROM orders
            WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)""",
        "minhash_signatures": f"""{_TOKS}, sh AS (
              SELECT DISTINCT doc_id, term AS shingle FROM toks2)
            SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id""",
        "lsh_candidate_pairs": f"""{_TOKS}, sh AS (
              SELECT DISTINCT doc_id, term AS shingle FROM toks2),
            sig AS (SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id),
            bands AS (
              SELECT doc_id, 0 AS band,
                     concat(CAST(mh0 AS VARCHAR), '_', CAST(mh1 AS VARCHAR)) AS sig
              FROM sig
              UNION ALL
              SELECT doc_id, 1 AS band,
                     concat(CAST(mh2 AS VARCHAR), '_', CAST(mh3 AS VARCHAR)) AS sig
              FROM sig)
            SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id""",
        # mirrors the LSH-gated Spark query: common pairs restricted to the
        # banded candidate set (cand is DISTINCT, so the inner join is an
        # exact semi join)
        "ngram_jaccard": f"""{_TOKS}, sh AS (
              SELECT DISTINCT doc_id, term AS shingle FROM toks2),
            sig AS (SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id),
            bands AS (
              SELECT doc_id, 0 AS band,
                     concat(CAST(mh0 AS VARCHAR), '_', CAST(mh1 AS VARCHAR)) AS sig
              FROM sig
              UNION ALL
              SELECT doc_id, 1 AS band,
                     concat(CAST(mh2 AS VARCHAR), '_', CAST(mh3 AS VARCHAR)) AS sig
              FROM sig),
            cand AS (
              SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            common AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_common
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            gated AS (
              SELECT common.id1, common.id2, common.n_common
              FROM common
              JOIN cand ON cand.id1 = common.id1 AND cand.id2 = common.id2)
            SELECT id1, id2, n_common,
                   ROUND(CAST(n_common AS DOUBLE) / (s1.sz + s2.sz - n_common), 6)
                     AS jaccard
            FROM gated
            JOIN sizes s1 ON s1.doc_id = id1
            JOIN sizes s2 ON s2.doc_id = id2
            WHERE CAST(n_common AS DOUBLE) / (s1.sz + s2.sz - n_common) >= 0.5""",
        "simhash": f"""{_TOKS},
            hashed AS (
              SELECT doc_id,
                     CAST(concat('0x', substring(md5(concat('0|', term)), 1, 15))
                          AS BIGINT) AS h
              FROM toks2),
            bitsums AS (SELECT doc_id, {sh_bits} FROM hashed GROUP BY doc_id)
            SELECT doc_id, CAST({sh_sig} AS BIGINT) AS simhash FROM bitsums""",
        "hybrid_topk": f"""WITH bm25_all AS ({_BM25_ORACLE.replace("LIMIT 10", "LIMIT 20").replace("tf.doc_id,", "tf.doc_id AS doc_id,")}),
            q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            knn_all AS (
              SELECT vec_id AS doc_id,
                     list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST(q.qv AS DOUBLE[])) AS kscore
              FROM embeddings CROSS JOIN q
              ORDER BY kscore DESC, doc_id ASC LIMIT 20),
            bn AS (
              SELECT doc_id,
                     CASE WHEN max(score) OVER () > min(score) OVER ()
                          THEN (score - min(score) OVER ())
                               / (max(score) OVER () - min(score) OVER ())
                          ELSE 1.0 END AS nb
              FROM bm25_all),
            kn AS (
              SELECT doc_id,
                     CASE WHEN max(kscore) OVER () > min(kscore) OVER ()
                          THEN (kscore - min(kscore) OVER ())
                               / (max(kscore) OVER () - min(kscore) OVER ())
                          ELSE 1.0 END AS nk
              FROM knn_all)
            SELECT COALESCE(bn.doc_id, kn.doc_id) AS doc_id,
                   ROUND(0.3 * COALESCE(nb, 0.0) + 0.7 * COALESCE(nk, 0.0), 6)
                     AS hybrid_score
            FROM bn FULL OUTER JOIN kn ON bn.doc_id = kn.doc_id
            ORDER BY hybrid_score DESC, doc_id ASC LIMIT 10""",
        "knn_cosine": """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            scored AS (
              SELECT vec_id,
                     ROUND(list_cosine_similarity(
                       CAST(embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 6)
                       AS cosine
              FROM embeddings CROSS JOIN q)
            SELECT CAST(row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS INT)
                     AS rank, vec_id, cosine
            FROM scored ORDER BY rank LIMIT 10""",
        "language_id": """WITH lt AS (
              SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
              FROM documents),
            hits AS (
              SELECT doc_id,
                sum(CASE WHEN tok IN ('der','die','und','das','ist') THEN 1 ELSE 0 END) AS s_de,
                sum(CASE WHEN tok IN ('the','and','of','to','a') THEN 1 ELSE 0 END) AS s_en,
                sum(CASE WHEN tok IN ('el','la','de','que','y') THEN 1 ELSE 0 END) AS s_es,
                sum(CASE WHEN tok IN ('이','그','은','는','을') THEN 1 ELSE 0 END) AS s_ko
              FROM lt GROUP BY doc_id)
            SELECT doc_id, CASE
              WHEN greatest(s_de, s_en, s_es, s_ko) = 0 THEN 'und'
              WHEN s_de = greatest(s_de, s_en, s_es, s_ko) THEN 'de'
              WHEN s_en = greatest(s_de, s_en, s_es, s_ko) THEN 'en'
              WHEN s_es = greatest(s_de, s_en, s_es, s_ko) THEN 'es'
              ELSE 'ko' END AS lang_pred
            FROM hits""",
        # sliding-window chunking (max=16, overlap=4 → step 12, min_chunk=6);
        # single-space corpus text ⇒ char-offset slices == token joins
        "chunking": """WITH toks AS (
              SELECT doc_id, text, string_split(text, ' ') AS t,
                     len(string_split(text, ' ')) AS n
              FROM documents),
            single AS (
              SELECT doc_id, CAST(0 AS INT) AS chunk_index,
                     CAST(1 AS INT) AS total_chunks, text AS chunk_text,
                     CAST(n AS INT) AS token_count
              FROM toks WHERE n <= 16),
            wins AS (
              SELECT doc_id, t, n,
                     unnest(generate_series(1, CAST(n AS BIGINT), 12)) AS st
              FROM toks WHERE n > 16),
            kept AS (
              SELECT doc_id, st,
                     array_to_string(t[st:least(st + 15, n)], ' ') AS chunk_text,
                     least(st + 15, n) - st + 1 AS token_count, n
              FROM wins
              WHERE least(st + 15, n) - st + 1 >= 6 OR st + 12 > n)
            SELECT doc_id,
                   CAST(row_number() OVER (PARTITION BY doc_id ORDER BY st) - 1
                        AS INT) AS chunk_index,
                   CAST(count(*) OVER (PARTITION BY doc_id) AS INT)
                     AS total_chunks,
                   chunk_text, CAST(token_count AS INT) AS token_count
            FROM kept
            UNION ALL
            SELECT doc_id, chunk_index, total_chunks, chunk_text, token_count
            FROM single""",
        "token_counts": """SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split(trim(text), ' ')) END AS n_tokens,
                   len(list_filter(string_split_regex(text, '[^a-zA-Z0-9가-힣]+'),
                       x -> x <> '')) AS n_words,
                   length(text) AS n_chars
            FROM documents""",
        "quality_scores": """WITH t AS (
              SELECT doc_id, text, trim(text) AS tt,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split(trim(text), ' ')) END AS nt
              FROM documents)
            SELECT doc_id, length(text) AS n_chars, nt AS n_tokens,
                   ROUND(CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
                         / greatest(length(text), 1), 6) AS punct_ratio,
                   ROUND(CASE WHEN nt = 0 THEN 0.0
                         ELSE CAST(list_sum(list_transform(
                                  string_split(tt, ' '), x -> length(x)))
                              AS DOUBLE)
                              / greatest(nt, 1) END, 6) AS avg_word_len,
                   ROUND(CAST(CASE WHEN nt = 0 THEN 0
                         ELSE len(list_distinct(string_split(tt, ' '))) END AS DOUBLE)
                         / greatest(nt, 1), 6) AS uniq_ratio
            FROM t""",
        "fingerprint": """SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
            FROM documents""",
        "tpch_q1": """SELECT l_returnflag, l_linestatus,
                   ROUND(sum(l_quantity), 6) AS sum_qty,
                   ROUND(sum(l_extendedprice), 6) AS sum_base_price,
                   ROUND(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
                   ROUND(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= '2024-09-01'
            GROUP BY 1, 2""",
        "tpch_q3": """SELECT o_orderkey,
                   ROUND(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey
            ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""",
        "tpch_q5": """SELECT n_name,
                   ROUND(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name ASC""",
        "tpch_q4": """SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate > o_orderdate)
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority""",
        "tpch_q7": """SELECT supp_nation, cust_nation, l_year,
                   ROUND(sum(volume), 6) AS revenue
            FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT)
                             AS l_year,
                         l_extendedprice * (1 - l_discount) AS volume
                  FROM lineitem
                  JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation n1 ON s_nationkey = n1.n_nationkey
                  JOIN nation n2 ON c_nationkey = n2.n_nationkey
                  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            GROUP BY supp_nation, cust_nation, l_year
            ORDER BY supp_nation, cust_nation, l_year""",
        "tpch_q10": """SELECT c_custkey, c_name, c_acctbal, n_name,
                   ROUND(sum(l_extendedprice * (1 - l_discount)), 6)
                       AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= '1996-10-01' AND o_orderdate < '1997-01-01'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey ASC LIMIT 20""",
        "tpch_q18": """SELECT c_name, c_custkey, o_orderkey,
                   o_orderdate AS orderdate, o_totalprice,
                   ROUND(sum_qty, 6) AS sum_qty
            FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
                  FROM lineitem GROUP BY l_orderkey
                  HAVING sum(l_quantity) > 300) big
            JOIN orders ON big.l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""",
        # regex extraction / KB linking are not SQL-expressible, but the
        # press corpus is a pure function of n_docs (corpus.ontology_docs)
        # so the expected aggregate is a CONSTANT: literal VALUES tables
        # generated once by scripts/gen_literal_goldens.py and
        # cross-checked against the pinned pytest goldens.
        "ontology_triples": _goldens.ontology_triples_oracle(),
        "entity_linking": _goldens.entity_linking_oracle(),
    }
