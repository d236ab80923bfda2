"""Physical-plan regression tests — the scale properties VERDICT audits.

These pin the plan SHAPE, not timings: exchange counts (the shuffle budget
of the postings build), predicate pushdown into the postings scan, and
broadcast of the small join sides. If a refactor silently adds a shuffle or
loses a pushed filter, these fail before any benchmark notices.
"""

import re

import pytest
from pyspark.sql import functions as F

from baram_spark.corpus import pages_df
from baram_spark.index.build import build_postings, shard_expr, tokenize_docs
from baram_spark.index.builder import IndexBuilder


def _plan(df, mode: str = "formatted") -> str:
    jdf = df._jdf
    spark = df.sparkSession
    em = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jdf.queryExecution().explainString(em)


def _n_shuffles(df) -> int:
    # hash/range repartition exchanges only — broadcast exchanges are free
    # of shuffle I/O and counted separately ("simple" mode inlines the
    # partitioning into the Exchange node line)
    plan = _plan(df, mode="simple")
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan))


@pytest.fixture(scope="module")
def doc_terms(spark):
    pages = pages_df(spark, 200, partitions=4)
    from baram_spark.index.build import extract_docs

    docs = extract_docs(pages)
    return tokenize_docs(docs).withColumn("shard", shard_expr(4))


def test_blob_mode_postings_is_one_shuffle(spark, doc_terms):
    """Default strategy: map-side packing means the ONLY exchange is the
    blob-level merge — regardless of skew (no salt machinery needed)."""
    out = build_postings(
        spark, doc_terms, {"title": 5.0, "content": 130.0}, salt_plan={},
        out_partitions=8,
    )
    assert _n_shuffles(out) == 1, _plan(out, "simple")


def test_rows_unsalted_postings_is_one_shuffle(spark, doc_terms):
    out = build_postings(
        spark, doc_terms, {"title": 5.0, "content": 130.0}, salt_plan={},
        out_partitions=8, row_shuffle=True,
    )
    assert _n_shuffles(out) == 1, _plan(out, "simple")


def test_rows_salted_postings_is_two_shuffles_plus_broadcast(spark, doc_terms):
    out = build_postings(
        spark, doc_terms, {"title": 5.0, "content": 130.0},
        salt_plan={("content", "the"): 4}, out_partitions=8, row_shuffle=True,
    )
    assert _n_shuffles(out) == 2, _plan(out, "simple")
    plan = _plan(out, "simple")
    # the salt plan joins broadcast, never shuffled
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan, plan


def test_blob_and_row_strategies_byte_identical(spark, doc_terms):
    """The two physical strategies must produce the SAME index: one row per
    (shard, field, term), identical df and identical packed bytes."""
    avgdl = {"title": 5.0, "content": 130.0}
    blob = build_postings(spark, doc_terms, avgdl, salt_plan={},
                          out_partitions=4).collect()
    rows = build_postings(spark, doc_terms, avgdl,
                          salt_plan={("content", "the"): 4},
                          out_partitions=4, row_shuffle=True).collect()

    def key(rs):
        return {
            (r["shard"], r["field"], r["term"]): (
                r["df"], bytes(r["postings"]), bytes(r["skips"]),
                bytes(r["blockmax"]),
            )
            for r in rs
        }

    kb, kr = key(blob), key(rows)
    assert len(kb) == len(blob) and len(kr) == len(rows)  # no dup terms
    assert kb == kr


def test_postings_lookup_pushes_term_filter(spark, tmp_path):
    out = f"{tmp_path}/plan_idx"
    b = IndexBuilder(spark, out, n_shards=2, salt_threshold=10**9)
    b.build(pages_df(spark, 120, partitions=4), fingerprint="plan")
    from baram_spark.query.engine import SearchEngine

    eng = SearchEngine(spark, out)
    lookup = eng._postings_rows(["the", "spark"])
    plan = _plan(lookup)
    assert "PushedFilters" in plan
    pushed = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert pushed and "term" in pushed.group(1), plan
    # column pruning: the scan must not read the wide blob columns' siblings
    # it doesn't need — ReadSchema carries only the projected columns
    rs = re.search(r"ReadSchema: struct<(.*?)>", plan)
    assert rs and "postings" in rs.group(1) and "term" in rs.group(1), plan


def test_filtered_docs_scan_pushes_category(spark, tmp_path):
    out = f"{tmp_path}/plan_idx2"
    b = IndexBuilder(spark, out, n_shards=2, salt_threshold=10**9)
    b.build(pages_df(spark, 120, partitions=4), fingerprint="plan2")
    from baram_spark.query.engine import SearchEngine

    eng = SearchEngine(spark, out)
    allowed = eng._allowed_docs("sports", None, None)
    plan = _plan(allowed)
    pushed = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert pushed and "category" in pushed.group(1), plan
    rs = re.search(r"ReadSchema: struct<(.*?)>", plan)
    # projection pruned to the two needed columns (html/text never read)
    assert rs and "text" not in rs.group(1) and "html" not in rs.group(1), plan


def test_exact_dedup_has_partial_aggregate(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i % 7}") for i in range(100)], "doc_id long, text string"
    )
    from baram_spark.operators.dedup import exact_dedup

    plan = _plan(exact_dedup(docs))
    # map-side combine: partial HashAggregate before the exchange
    assert plan.count("HashAggregate") >= 2, plan
    assert _n_shuffles(exact_dedup(docs)) == 1, plan


def test_resolve_shuffle_mode():
    """auto = rows on a single-box local master (shuffle never crosses a
    network), blob on any cluster master; explicit modes pass through."""
    from baram_spark.index.build import resolve_shuffle_mode

    assert resolve_shuffle_mode("local[32]") == "rows"
    assert resolve_shuffle_mode("local[*]", "auto") == "rows"
    for cluster in ("yarn", "spark://host:7077", "k8s://https://api:6443"):
        assert resolve_shuffle_mode(cluster) == "blob"
    assert resolve_shuffle_mode(None) == "blob"
    assert resolve_shuffle_mode("yarn", "rows") == "rows"
    assert resolve_shuffle_mode("local[8]", "blob") == "blob"
    with pytest.raises(ValueError, match="rows|blob|auto"):
        resolve_shuffle_mode("local[8]", "fast")


def test_builder_resolves_auto_mode(spark):
    """On the test session's local master the default builder must land on
    rows (and expose the resolved mode, not the sentinel)."""
    b = IndexBuilder(spark, "/tmp/_mode_probe", n_shards=2)
    assert b.shuffle_mode == "rows"
    b2 = IndexBuilder(spark, "/tmp/_mode_probe", n_shards=2,
                      shuffle_mode="blob")
    assert b2.shuffle_mode == "blob"


def test_arrow_packer_matches_legacy_packer_kernel():
    """_pack_partition_arrow (unsorted arrow input, production) must emit
    byte-identical groups to _pack_runs (the legacy sorted-pandas kernel)
    — both codecs, salted groups included."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from baram_spark.index.build import _pack_partition_arrow, _pack_runs
    from baram_spark.index.codec import CODEC_FOR, CODEC_VARINT

    rng = np.random.default_rng(7)
    n = 20_000
    group = rng.integers(0, 900, n)
    pdf = pd.DataFrame(
        {
            "doc_id": rng.choice(10**9, size=n, replace=False).astype(
                "int64"
            ),
            "field": np.where(group % 3 == 0, "title", "content"),
            "term": np.char.add("t", (group // 3).astype(str)),
            "tf": rng.integers(1, 9, n).astype("int32"),
            "dl": rng.integers(5, 400, n).astype("int32"),
            "shard": (group % 4).astype("int32"),
            "salt": (group % 5).astype("int32"),
        }
    )
    avgdl = {"title": 5.0, "content": 130.0}
    for codec in (CODEC_VARINT, CODEC_FOR):
        run = _pack_partition_arrow(avgdl, codec)
        batches = [
            pa.RecordBatch.from_pandas(chunk, preserve_index=False)
            for chunk in np.array_split(pdf, 7)
        ]
        got = {}
        for out in run(iter(batches)):
            t = out.to_pydict()
            for i in range(out.num_rows):
                k = (t["shard"][i], t["field"][i], t["term"][i],
                     t["salt"][i])
                assert k not in got, f"duplicate group {k}"
                got[k] = (t["df"][i], t["postings"][i], t["skips"][i],
                          t["blockmax"][i])
        sorted_pdf = pdf.sort_values(
            ["shard", "field", "term", "salt", "doc_id"], kind="stable"
        ).reset_index(drop=True)
        ref = _pack_runs(sorted_pdf, avgdl, codec)
        want = {
            (int(r.shard), r.field, r.term, int(r.salt)): (
                int(r.df), bytes(r.postings), bytes(r.skips),
                bytes(r.blockmax),
            )
            for r in ref.itertuples()
        }
        got = {
            k: (int(df_), bytes(p), bytes(s), bytes(b))
            for k, (df_, p, s, b) in got.items()
        }
        assert got == want, f"codec {codec} mismatch"


def test_arrow_packer_chunked_matches_whole_partition():
    """A partition spanning several pack chunks must emit byte-identical
    groups to the single-chunk pack (and hence to _pack_runs): split
    groups are decoded, stable-sorted, re-encoded; unsplit groups pass
    through untouched. Both codecs."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from baram_spark.index.build import _pack_partition_arrow, _pack_runs
    from baram_spark.index.codec import CODEC_FOR, CODEC_VARINT

    rng = np.random.default_rng(11)
    n = 30_000
    group = rng.integers(0, 700, n)
    pdf = pd.DataFrame(
        {
            "doc_id": rng.choice(10**9, size=n, replace=False).astype(
                "int64"
            ),
            "field": np.where(group % 3 == 0, "title", "content"),
            "term": np.char.add("t", (group // 3).astype(str)),
            "tf": rng.integers(1, 9, n).astype("int32"),
            "dl": rng.integers(5, 400, n).astype("int32"),
            "shard": (group % 4).astype("int32"),
            "salt": (group % 5).astype("int32"),
        }
    )
    avgdl = {"title": 5.0, "content": 130.0}
    batches = [
        pa.RecordBatch.from_pandas(chunk, preserve_index=False)
        for chunk in np.array_split(pdf, 13)
    ]
    sorted_pdf = pdf.sort_values(
        ["shard", "field", "term", "salt", "doc_id"], kind="stable"
    ).reset_index(drop=True)
    for codec in (CODEC_VARINT, CODEC_FOR):
        # chunk_rows forces ~6 chunks of ~2-3 batches each
        run = _pack_partition_arrow(avgdl, codec, chunk_rows=5_000)
        got = {}
        for out in run(iter(batches)):
            t = out.to_pydict()
            for i in range(out.num_rows):
                k = (t["shard"][i], t["field"][i], t["term"][i],
                     t["salt"][i])
                assert k not in got, f"duplicate group {k}"
                got[k] = (t["df"][i], bytes(t["postings"][i]),
                          bytes(t["skips"][i]), bytes(t["blockmax"][i]))
        ref = _pack_runs(sorted_pdf, avgdl, codec)
        want = {
            (int(r.shard), r.field, r.term, int(r.salt)): (
                int(r.df), bytes(r.postings), bytes(r.skips),
                bytes(r.blockmax),
            )
            for r in ref.itertuples()
        }
        got = {k: (int(d), p, s, b) for k, (d, p, s, b) in got.items()}
        assert got == want, f"codec {codec} mismatch"


def test_arrow_packer_slices_emit_at_bytes_cap(monkeypatch):
    """pa.binary() arrays carry 32-bit offsets (2 GiB cap per array) and
    blob-path scan partitions are unbounded, so run() slices its output
    at PACK_EMIT_BYTES_CAP. With a tiny cap the packer must yield many
    batches whose concatenation is row-identical (same order) to the
    single-batch emit, each batch's binary payload within cap + one row."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from baram_spark.index import build
    from baram_spark.index.build import _pack_partition_arrow
    from baram_spark.index.codec import CODEC_VARINT

    rng = np.random.default_rng(23)
    n = 8_000
    group = rng.integers(0, 300, n)
    pdf = pd.DataFrame(
        {
            "doc_id": rng.choice(10**9, size=n, replace=False).astype(
                "int64"
            ),
            "field": np.where(group % 3 == 0, "title", "content"),
            "term": np.char.add("t", (group // 3).astype(str)),
            "tf": rng.integers(1, 9, n).astype("int32"),
            "dl": rng.integers(5, 400, n).astype("int32"),
            "shard": (group % 4).astype("int32"),
            "salt": np.zeros(n, dtype="int32"),
        }
    )
    avgdl = {"title": 5.0, "content": 130.0}
    batches = [pa.RecordBatch.from_pandas(c, preserve_index=False)
               for c in np.array_split(pdf, 5)]

    def rows(outs):
        t = pa.Table.from_batches(outs).to_pydict()
        return list(zip(t["shard"], t["field"], t["term"], t["salt"],
                        t["df"], t["postings"], t["skips"], t["blockmax"]))

    run = _pack_partition_arrow(avgdl, CODEC_VARINT)
    whole = list(run(iter(batches)))

    cap = 2_000  # bytes — forces many slices on this corpus
    monkeypatch.setattr(build, "PACK_EMIT_BYTES_CAP", cap)
    run = _pack_partition_arrow(avgdl, CODEC_VARINT)
    sliced = list(run(iter(batches)))

    assert len(whole) == 1 and len(sliced) > 3
    assert rows(sliced) == rows(whole)  # same rows, same order
    per_row_max = max(len(p) + len(s) + len(b)
                      for _, _, _, _, _, p, s, b in rows(whole))
    for out in sliced:
        payload = sum(
            len(v) for col in ("postings", "skips", "blockmax")
            for v in out.column(col).to_pylist()
        )
        assert payload <= cap + per_row_max
