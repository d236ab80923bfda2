"""Mimics the driver's correctness gate: every queries() entry vs its
oracle_sql() via DuckDB — row count, column names, order-insensitive values.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
                    if v == -0.0:
                        v = 0.0
            vals.append((c, v))
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_rows = [r.asDict() for r in sdf.collect()]
    cur = duck.execute(ORACLES[name])
    cols = [d[0] for d in cur.description]
    duck_rows = [dict(zip(cols, r)) for r in cur.fetchall()]

    assert sorted(sdf.columns) == sorted(cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _normalize(spark_rows, sdf.columns)
    b = _normalize(duck_rows, cols)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mism, f"{name}: first mismatch {a[mism[0]]} vs {b[mism[0]]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]


def test_simhash_runs(spark):
    # no SQL oracle (bit-level op) — rows-only sanity
    df = QUERIES["simhash"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["simhash"] is not None for r in rows)


def test_trends_reference_semantics(spark):
    """Reference-parity edges: single-point series → insufficient_data
    (NOT falling_fast via the NULL-skipping clamp); zero baseline →
    pct_change 100.0; series shorter than the window emit no spikes;
    PMI is log2 like entity_trends.rs."""
    import math
    from datetime import date

    from pyspark.sql import functions as F

    from baram_spark.operators import trends

    series = spark.createDataFrame(
        [("solo", date(2024, 1, 1), 5)]
        + [("zero", date(2024, 1, 1), 0), ("zero", date(2024, 1, 2), 4)]
        + [("short", date(2024, 1, d), c)
           for d, c in ((1, 1), (2, 1), (3, 10))],
        "key string, day date, cnt long",
    )
    slope = {r["key"]: r for r in trends.trend_slope(series).collect()}
    assert slope["solo"]["direction"] == "insufficient_data"
    assert slope["solo"]["velocity"] is None

    pct = {(r["key"], str(r["day"])): r["pct_change"]
           for r in trends.percent_change(series).collect()}
    assert pct[("zero", "2024-01-02")] == 100.0

    spikes = trends.detect_spikes(series, window_size=7,
                                  threshold=2.0).collect()
    assert spikes == []  # every series here is shorter than the window

    ents = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "c")],
        "doc_id long, entity string",
    )
    row = trends.pmi_cooccurrence(ents, min_pairs=2).collect()[0]
    # P(ab)=2/4, P(a)=3/4, P(b)=2/4 → log2(0.5/0.375) = 0.415037
    assert row["pmi"] == round(math.log2((2 / 4) / ((3 / 4) * (2 / 4))), 6)


def test_text_analysis_empty_doc_semantics(spark):
    from baram_spark.operators.text_analysis import (
        quality_scores,
        token_counts,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "  two words  ")],
        "doc_id long, text string",
    )
    tc = {r["doc_id"]: r for r in token_counts(docs).collect()}
    assert tc[1]["n_tokens"] == 0 and tc[2]["n_tokens"] == 0
    assert tc[3]["n_tokens"] == 2

    qs = {r["doc_id"]: r for r in quality_scores(docs).collect()}
    assert qs[1]["n_tokens"] == 0 and qs[1]["avg_word_len"] == 0.0
    assert qs[2]["avg_word_len"] == 0.0 and qs[2]["uniq_ratio"] == 0.0
    # "two words": trimmed 9 chars, 2 tokens → (9-2+1)/2 = 4.0
    assert qs[3]["avg_word_len"] == 4.0
