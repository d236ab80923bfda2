"""Filesystem-agnostic metadata layer (baram_spark.index.fs).

The reference's store is remote by nature (OpenSearch,
src/embedding/mod.rs:237-350); the Spark analog must therefore run its
whole snapshot/manifest/GC protocol through pyarrow.fs so the index can
live on S3/HDFS/GCS.  These tests (a) unit-test the fs module against a
registered non-local pyarrow FileSystem, (b) grep-enforce that no module
of the metadata plane calls the local os API directly, and (c) run the
full build→search→delete→compact→merge→vacuum cycle against a
``mock://`` URI backed by a SubTreeFileSystem."""

import re

import numpy as np
import pytest
from pyarrow import fs as pafs

from baram_spark.index import fs


# -- unit: path resolution + ops over a registered scheme -------------------

def test_resolve_variants(tmp_path):
    f, p = fs.resolve(str(tmp_path))
    assert isinstance(f, pafs.LocalFileSystem) and p == str(tmp_path)
    for prefix in ("file:", "file://", "file:///"):
        f, p = fs.resolve(f"{prefix}{str(tmp_path).lstrip('/')}"
                          if prefix.endswith("//")
                          else f"{prefix}{tmp_path}")
        assert isinstance(f, pafs.LocalFileSystem)
    f, p = fs.resolve(f"file:{tmp_path}")
    assert p == str(tmp_path)


def test_registered_scheme_ops(tmp_path):
    root = str(tmp_path / "store")
    (tmp_path / "store").mkdir()
    fs.register_filesystem(
        "t1", pafs.SubTreeFileSystem(root, pafs.LocalFileSystem()),
        spark_root=root)
    try:
        base = "t1://idx"
        fs.makedirs(f"{base}/docs/gen=0")
        assert fs.isdir(f"{base}/docs") and fs.exists(f"{base}/docs/gen=0")
        assert not fs.exists(f"{base}/nope")
        assert fs.listdir(f"{base}/docs") == ["gen=0"]
        assert fs.listdir(f"{base}/missing") == []
        # atomic-swap pattern used by the manifest commit
        fs.write_text(f"{base}/.m.tmp", '{"snapshot_id": 1}')
        fs.rename(f"{base}/.m.tmp", f"{base}/_manifest.json")
        assert fs.read_json(f"{base}/_manifest.json") == {"snapshot_id": 1}
        assert fs.read_json(f"{base}/no_manifest.json") is None
        # spark translation points at the same bytes
        assert fs.spark_url(f"{base}/docs") == f"file:{root}/idx/docs"
        # recursive dir walk (shard detection)
        fs.makedirs(f"{base}/postings/gen=0/shard=3")
        assert "shard=3" in fs.walk_dir_names(f"{base}/postings")
        # parquet round-trip through the filesystem
        import pyarrow as pa

        fs.write_parquet_file(f"{base}/meta.parquet",
                              pa.table({"n": [7]}))
        assert fs.read_parquet(f"{base}/meta.parquet")["n"][0].as_py() == 7
        fs.rmtree(f"{base}/docs")
        fs.rmtree(f"{base}/docs")  # idempotent
        assert not fs.exists(f"{base}/docs")
        fs.remove(f"{base}/_manifest.json")
        assert not fs.exists(f"{base}/_manifest.json")
    finally:
        fs.unregister_filesystem("t1")


# -- grep-enforcement: the metadata plane never calls os directly -----------

def test_no_direct_os_metadata_calls():
    """builder/engine/lineage/serving must route ALL metadata I/O through
    baram_spark.index.fs — a direct os/shutil call would break the index
    on any non-POSIX store."""
    import baram_spark

    root = baram_spark.__path__[0]
    banned = re.compile(
        r"os\.path\.(exists|isdir)\(|os\.(listdir|walk|rename|remove|"
        r"makedirs)\(|shutil\.rmtree\(|removeprefix\(\"file:\"\)"
    )
    offenders = []
    for mod in ("index/builder.py", "index/lineage.py",
                "query/engine.py", "serving.py", "streaming/ingest.py",
                "__main__.py"):
        for i, line in enumerate(open(f"{root}/{mod}"), 1):
            if banned.search(line):
                offenders.append(f"{mod}:{i}: {line.strip()}")
    assert not offenders, "\n".join(offenders)


# -- integration: full index lifecycle against a mock:// URI ----------------

@pytest.fixture(scope="module")
def mock_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mockfs"))
    fs.register_filesystem(
        "mock", pafs.SubTreeFileSystem(root, pafs.LocalFileSystem()),
        spark_root=root)
    yield "mock://idx"
    fs.unregister_filesystem("mock")


def test_full_lifecycle_on_mock_scheme(spark, mock_index):
    from baram_spark.corpus import make_query_set, pages_df
    from baram_spark.index.builder import IndexBuilder
    from baram_spark.query.bm25 import BruteForceIndex
    from baram_spark.query.engine import SearchEngine

    out = mock_index
    b = IndexBuilder(spark, out, n_shards=2, salt_threshold=10**9)
    m = b.build(pages_df(spark, 150, partitions=2), fingerprint="mockfs")
    assert b.committed_generations() == [0]
    assert fs.exists(f"{out}/_manifest.json")

    from baram_spark.index.builder import read_gen_table

    def oracle():
        # committed snapshot only — the whole-dir read would double-count
        # superseded generations retained for pinned readers
        docs = (
            read_gen_table(spark, out, "docs")
            .select("doc_id", "title", "text").toPandas()
        )
        return BruteForceIndex.build(
            [(int(r.doc_id), r.title, r.text) for r in docs.itertuples()]
        )

    def norm(hits):
        return [(d, round(s, 9)) for d, s in hits]

    engine = SearchEngine(spark, out)
    q = make_query_set()[0]["query_text"]
    hits = engine.search(q, k=10, mode="local")
    assert hits and norm(hits) == norm(oracle().search(q, k=10))
    # distributed mode reads the same mock-backed postings
    assert norm(engine.search(q, k=10, mode="distributed")) == norm(hits)

    # incremental wave → second generation
    b.build_incremental(pages_df(spark, 230, partitions=2),
                        fingerprint="mockfs-w2")
    assert b.committed_generations() == [0, 1]

    # tombstone two hit docs; they leave results immediately
    victims = [hits[0][0], hits[1][0]]
    b.delete_docs(victims)
    engine = SearchEngine(spark, out)
    got = [d for d, _ in engine.search(q, k=10, mode="local")]
    assert not set(victims) & set(got)

    # compact physically removes them and clears tombstones
    res = b.compact(fingerprint="mockfs-compact")
    assert res["tombstones"] == 2
    assert b.deleted_ids() == []
    engine = SearchEngine(spark, out)
    assert norm(engine.search(q, k=10, mode="local")) == norm(
        oracle().search(q, k=10))

    # merge to one generation, then vacuum the retired dirs
    b.merge_generations(fingerprint="mockfs-merge")
    gens = b.committed_generations()
    assert len(gens) == 1
    b.vacuum(retain_snapshots=1)
    on_disk = {
        int(d.split("=")[1]) for d in fs.listdir(f"{out}/postings")
        if d.startswith("gen=")
    }
    assert on_disk == set(gens)
    engine = SearchEngine(spark, out)
    assert norm(engine.search(q, k=10, mode="local")) == norm(
        oracle().search(q, k=10))

    # the serving tier loads the same mock-backed snapshot
    from baram_spark.serving import ServingContext

    ctx = ServingContext(spark, out)
    res = ctx.search(q, mode="bm25", k=5)
    assert res["total"] == 5
    assert [int(r["id"].split("_")[0]) >= 0 for r in res["results"]]
