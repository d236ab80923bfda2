"""Trend / window analytics — SURVEY §2.6 G1-G10.

Spark-native rebuilds of ``/root/reference/src/analytics/keyword_trends.rs``
and ``entity_trends.rs``: trailing moving average (G1), z-score spike
detection (G2), OLS trend slope (G3), percent change (G4), min-max
normalization (G5), top-k trending (G6), range counts (G7), averages (G8),
PMI co-occurrence (G9), top entities (G10).

All operators take a ``series`` DataFrame of (key, ts, cnt) — produced by
``daily_counts`` from a raw event stream — and use window functions, so the
only shuffle is the initial groupBy/partitionBy on the series key. Every
aggregation is algebraic (map-side partials apply); nothing collects to the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def daily_counts(events: DataFrame, key_col: str = "event_type",
                 ts_col: str = "ts") -> DataFrame:
    """Event stream → per-key daily count series (the KeywordTrend analog,
    keyword_trends.rs:124-155)."""
    return (
        events.groupBy(
            F.col(key_col).alias("key"),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
        )
        .agg(F.count("*").alias("cnt"))
    )


def _series_window():
    return Window.partitionBy("key").orderBy("day")


def moving_average(series: DataFrame, window_size: int = 7) -> DataFrame:
    """G1: trailing moving average over the last ``window_size`` points
    (keyword_trends.rs:220-249)."""
    w = _series_window().rowsBetween(-(window_size - 1), 0)
    return series.withColumn(
        "moving_avg", F.round(F.avg("cnt").over(w), 6)
    )


def detect_spikes(series: DataFrame, window_size: int = 7,
                  threshold: float = 2.0) -> DataFrame:
    """G2: spike magnitude = cnt/moving_avg; z-score over the whole series
    (keyword_trends.rs:260-302)."""
    w_ma = _series_window().rowsBetween(-(window_size - 1), 0)
    w_all = Window.partitionBy("key")
    out = (
        series.withColumn("moving_avg", F.avg("cnt").over(w_ma))
        .withColumn("mu", F.avg("cnt").over(w_all))
        .withColumn("sigma", F.stddev_pop("cnt").over(w_all))
        .withColumn(
            "magnitude",
            F.round(F.when(F.col("moving_avg") > 0, F.col("cnt") / F.col("moving_avg")), 6),
        )
        .withColumn(
            "zscore",
            F.round(
                F.when(F.col("sigma") > 0, (F.col("cnt") - F.col("mu")) / F.col("sigma"))
                .otherwise(F.lit(0.0)),
                6,
            ),
        )
    )
    # the reference emits NO spikes for series shorter than the window
    # (keyword_trends.rs detect_spikes: data.len() < window_size guard)
    n_per_key = F.count("*").over(Window.partitionBy("key"))
    return (
        out.withColumn("_n", n_per_key)
        .filter((F.col("magnitude") >= threshold)
                & (F.col("_n") >= F.lit(window_size)))
        .select("key", "day", "cnt", "magnitude", "zscore")
    )


def trend_slope(series: DataFrame) -> DataFrame:
    """G3: OLS slope of cnt over day-index per key, velocity = slope/mean
    clamped to [-1, 1], bucketed to 5 classes (keyword_trends.rs:313-357)."""
    w = Window.partitionBy("key").orderBy("day")
    idx = series.withColumn("x", F.row_number().over(w).cast("double"))
    agg = idx.groupBy("key").agg(
        F.regr_slope(F.col("cnt").cast("double"), F.col("x")).alias("slope"),
        F.avg("cnt").alias("mean_cnt"),
    )
    vel = F.when(F.col("mean_cnt") > 0, F.col("slope") / F.col("mean_cnt")).otherwise(
        F.lit(0.0)
    )
    # Spark greatest/least SKIP nulls, so a NULL slope (single-point
    # series) would clamp to -1.0 and read as falling_fast; the reference
    # refuses <2-point series (InsufficientData, keyword_trends.rs:319)
    vel = F.when(
        F.col("slope").isNotNull(),
        F.least(F.greatest(vel, F.lit(-1.0)), F.lit(1.0)),
    )
    return agg.select(
        "key",
        F.round("slope", 6).alias("slope"),
        F.round(vel, 6).alias("velocity"),
        F.when(F.col("slope").isNull(), "insufficient_data")
        .when(vel > 0.5, "rising_fast")
        .when(vel > 0.1, "rising")
        .when(vel < -0.5, "falling_fast")
        .when(vel < -0.1, "falling")
        .otherwise("stable")
        .alias("direction"),
    )


def percent_change(series: DataFrame) -> DataFrame:
    """G4: day-over-day percent change per key (keyword_trends.rs:367-390)."""
    w = _series_window()
    prev = F.lag("cnt").over(w)
    return series.select(
        "key",
        "day",
        "cnt",
        F.round(
            F.when(prev > 0, (F.col("cnt") - prev) * 100.0 / prev)
            # zero baseline reports the reference's arbitrary high value
            # (keyword_trends.rs:381-383); first row (no prev) stays NULL
            .when(prev == 0, F.lit(100.0)),
            6,
        ).alias("pct_change"),
    )


def minmax_normalize(series: DataFrame) -> DataFrame:
    """G5: per-key min-max normalization; constant series → 0.5
    (keyword_trends.rs:395-416)."""
    w = Window.partitionBy("key")
    mn, mx = F.min("cnt").over(w), F.max("cnt").over(w)
    return series.select(
        "key",
        "day",
        "cnt",
        F.round(
            F.when(mx > mn, (F.col("cnt") - mn) / (mx - mn)).otherwise(F.lit(0.5)), 6
        ).alias("normalized"),
    )


def top_trending(series: DataFrame, k: int = 5) -> DataFrame:
    """G6/G10: top-k keys by total count, deterministic tie-break on key."""
    totals = series.groupBy("key").agg(F.sum("cnt").alias("total"))
    w = Window.orderBy(F.desc("total"), F.asc("key"))
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "key", "total")
    )


def range_count(events: DataFrame, start: str, end: str,
                key_col: str = "event_type", ts_col: str = "ts") -> DataFrame:
    """G7: counts per key within [start, end) (entity_trends.rs:172-192)."""
    return (
        events.filter((F.col(ts_col) >= F.lit(start)) & (F.col(ts_col) < F.lit(end)))
        .groupBy(F.col(key_col).alias("key"))
        .agg(F.count("*").alias("cnt"))
    )


def avg_metric(events: DataFrame, key_col: str = "event_type",
               value_col: str = "value") -> DataFrame:
    """G8: average metric per key (avg sentiment analog,
    entity_trends.rs:194-209)."""
    return events.groupBy(F.col(key_col).alias("key")).agg(
        F.round(F.avg(value_col), 6).alias("avg_value")
    )


def pmi_cooccurrence(doc_entities: DataFrame, min_pairs: int = 2) -> DataFrame:
    """G9: PMI over entity pairs co-occurring in documents
    (entity_trends.rs:260-468).

    ``doc_entities``: (doc_id, entity) distinct pairs. Classic pair-count
    self-join on doc_id with e1 < e2; PMI = log2(p_ab / (p_a * p_b))
    (base 2 like the reference, entity_trends.rs:254-262).
    """
    # ONE shuffle builds per-doc sorted entity sets (collect_set dedups,
    # so no pre-distinct exchange); pairs explode INSIDE the row via
    # array ops instead of the r5 doc_id self-join (SMJ + two exchanges
    # whose output was the same pair multiset). Counts are integers —
    # partition-order-insensitive.
    # cached: three consumers (n_docs, ent_counts, pairs) would otherwise
    # each re-run the upstream scan+aggregate; the relation is one short
    # array row per doc, and the count() below materializes it
    sets = doc_entities.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("entity")).alias("es")
    ).cache()
    n_docs = sets.count()
    ent_counts = (
        sets.select(F.explode("es").alias("entity"))
        .groupBy("entity").agg(F.count("*").alias("n"))
    )
    pair_expr = F.expr(
        "flatten(transform(es, (x, i) -> "
        "transform(slice(es, i + 2, size(es)), "
        "y -> named_struct('e1', x, 'e2', y))))"
    )
    pairs = (
        sets.select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.e1").alias("e1"), F.col("p.e2").alias("e2"))
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pairs)
    )
    ca = ent_counts.withColumnRenamed("entity", "e1").withColumnRenamed("n", "n_a")
    cb = ent_counts.withColumnRenamed("entity", "e2").withColumnRenamed("n", "n_b")
    return (
        pairs.join(ca, "e1")
        .join(cb, "e2")
        .select(
            "e1",
            "e2",
            "n_ab",
            F.round(
                F.log2(
                    (F.col("n_ab").cast("double") / n_docs)
                    / (
                        (F.col("n_a").cast("double") / n_docs)
                        * (F.col("n_b").cast("double") / n_docs)
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
