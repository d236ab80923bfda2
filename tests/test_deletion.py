"""Doc deletion: delete_by_query tombstones (mod.rs:768-818 analog),
query-time exclusion, and physical compaction."""

import pytest
from pyspark.sql import functions as F

from baram_spark.corpus import make_query_set, pages_df
from baram_spark.index.builder import IndexBuilder
from baram_spark.query.engine import SearchEngine

N = 300


@pytest.fixture()
def del_index(spark, tmp_path):
    out = f"{tmp_path}/del_idx"
    builder = IndexBuilder(spark, out, n_shards=2, salt_threshold=10**9)
    builder.build(pages_df(spark, N, partitions=4), fingerprint="del-test")
    return out, builder


def test_delete_then_query_excludes_doc(spark, del_index):
    out, builder = del_index
    q = make_query_set()[0]["query_text"]
    engine = SearchEngine(spark, out)
    before = engine.search(q, k=10)
    assert before
    victim = before[0][0]

    url = spark.read.parquet(f"{out}/docs").filter(
        F.col("doc_id") == victim
    ).collect()[0]["url"]
    n = builder.delete_by_query(f"url = '{url}'")
    assert n == 1
    # idempotent: re-deleting adds no new tombstone
    assert builder.delete_by_query(f"url = '{url}'") == 0

    fresh = SearchEngine(spark, out)
    for mode in ("local", "distributed"):
        after = fresh.search(q, k=10, mode=mode)
        assert all(d != victim for d, _ in after), mode
        # survivors keep their exact pre-delete scores (Lucene deleted-docs
        # semantics: stats unchanged until compaction)
        before_d = dict(before)
        for d, s in after:
            if d in before_d:
                assert before_d[d] == s


def test_deleted_doc_excluded_with_filters(spark, del_index):
    out, builder = del_index
    q = make_query_set()[0]["query_text"]
    engine = SearchEngine(spark, out)
    hits = engine.search(q, k=20, category="sports")
    if not hits:
        pytest.skip("no sports hits for this query")
    victim = hits[0][0]
    builder.delete_docs([victim])
    fresh = SearchEngine(spark, out)
    after = fresh.search(q, k=20, category="sports")
    assert all(d != victim for d, _ in after)


def test_compact_physically_removes(spark, del_index):
    out, builder = del_index
    q = make_query_set()[1]["query_text"]
    engine = SearchEngine(spark, out)
    before = engine.search(q, k=5)
    assert before
    victim = before[0][0]
    builder.delete_docs([victim])

    res = builder.compact()
    assert res["tombstones"] == 1
    assert res["compacted_gens"] == [0]
    # survivors were rewritten into a FRESH generation (never in-place:
    # stale dynamic-overwrite partitions are impossible by construction)
    assert res["new_gens"] == [1]
    assert builder.committed_generations() == [1]
    # tombstone set cleared
    assert builder.deleted_ids() == []
    # the superseded gen 0 dirs survive for readers pinned to the previous
    # snapshot; expiring it reclaims them
    assert 0 in builder.generations()
    gc = builder.vacuum(retain_snapshots=1)
    assert gc["removed_gens"] == [0]
    assert builder.generations() == [1]

    # physically gone from every table
    assert spark.read.parquet(f"{out}/docs").filter(
        F.col("doc_id") == victim
    ).isEmpty()
    assert spark.read.parquet(f"{out}/doc_terms").filter(
        F.col("doc_id") == victim
    ).isEmpty()

    # a fresh engine (no tombstones anywhere) no longer returns the doc,
    # and the index is self-consistent: per-shard postings df == term_stats
    fresh = SearchEngine(spark, out)
    assert fresh._denied is None
    after = fresh.search(q, k=5)
    assert all(d != victim for d, _ in after)
    post = spark.read.parquet(f"{out}/postings")
    from tests.conftest import stats_dir
    ts = spark.read.parquet(stats_dir(out, "term_stats"))
    agg = post.groupBy("field", "term").agg(F.sum("df").alias("df_sum"))
    bad = (
        agg.join(ts, ["field", "term"], "full")
        .filter(
            F.coalesce(F.col("df_sum"), F.lit(-1))
            != F.coalesce(F.col("df"), F.lit(-2))
        )
        .count()
    )
    assert bad == 0
