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
