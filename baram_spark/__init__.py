"""baram_spark — a PySpark-native crawl-to-search analytics engine.

A from-scratch rebuild of the capabilities of hephaex/Baram (reference at
/root/reference, Rust): HTML article extraction, nori-style Korean/multilingual
analysis, sharded inverted-index construction (delta+varint posting lists,
skip pointers, block-max metadata), distributed BM25 top-k search, plus the
dedup / trend-analytics / similarity operators Baram layers on top — all
re-expressed Spark-first (DataFrame/SQL + Arrow-vectorized UDFs).

Layout
------
- ``textproc``   sanitize chain, HTML extraction, date parsing, analyzer
- ``index``      posting-list codec, index build pipeline, lineage/resume
- ``query``      BM25 scoring, block-max WAND, distributed top-k engine
- ``operators``  dedup (exact/minhash/simhash), similarity search, text
                 analysis, trend/window analytics
- ``sources``    table readers/writers (parquet now; Iceberg-ready layout)
"""

__version__ = "0.1.0"
