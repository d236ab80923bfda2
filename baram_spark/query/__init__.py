"""Query path: BM25 scoring, block-max WAND, distributed top-k engine."""
