"""Literal golden aggregates for the two non-SQL-expressible driver
queries (rule-based ontology triple extraction, entity linking).

The press-style input corpus is deterministic — ``corpus.ontology_docs``
renders doc i's sentences as index-rotations of a fixed template bank, so
the extracted triple/entity sets are a PURE FUNCTION of n_docs (=400 in
the driver queries, independent of sf_dir). These constants were generated
once by ``scripts/gen_literal_goldens.py``, which cross-checks them
against the independently pinned pytest goldens
(tests/test_ontology.py::test_ontology_corpus_aggregate_golden,
tests/test_linker.py::test_entity_linking_query_golden) before printing.

Reference semantics: /root/reference/src/ontology/extractor.rs:1526-1857
(rule path) and linker.rs:321-769 (KB/alias/fuzzy linking); regex
extraction is not expressible in SQL, so the DuckDB oracle is this
expected-constant table — the driver hash-verifies the full aggregate
instead of a rows-only check.
"""

# (predicate, predicate_label, n_triples, n_subjects, avg_confidence)
ONTOLOGY_TRIPLES_GOLDEN = [
    ("baram:criticized", "비판", 96, 3, 0.96),
    ("baram:mergedWith", "합병", 42, 2, 0.96),
    ("baram:opposed", "반대", 126, 1, 0.96),
    ("baram:supported", "지지", 126, 1, 0.96),
    ("schema:acquiredFrom", "인수", 234, 6, 0.96),
    ("schema:author", "발언", 126, 8, 0.96),
    ("schema:founder", "대표", 25, 1, 0.96),
    ("schema:investor", "투자", 330, 6, 0.96),
    ("schema:location", "위치", 126, 1, 0.96),
    ("schema:memberOf", "소속", 127, 8, 0.96),
    ("schema:owns", "소유", 126, 1, 0.96),
    ("schema:participant", "참여", 126, 1, 0.96),
    ("schema:publicationDate", "발표", 126, 1, 0.96),
    ("schema:worksFor", "근무", 103, 8, 0.96),
]

# (canonical, entity_type, in_knowledge_base, mentions, n_docs, wikidata)
ENTITY_LINKING_GOLDEN = [
    ("더불어민주당", "Organization", True, 277, 172, "Q21207862"),
    ("한빛전자", "Organization", False, 214, 214, None),
    ("정부", "Organization", False, 211, 211, None),
    ("미래그룹", "Organization", False, 203, 203, None),
    ("기획재정부", "Organization", True, 184, 149, "Q483867"),
    ("윤도현", "Person", False, 166, 166, None),
    ("크래프트테크", "Organization", False, 155, 155, None),
    ("미국", "Location", True, 147, 147, "Q30"),
    ("미래그룹", "Person", False, 142, 142, None),
    ("한솔건설", "Organization", False, 136, 136, None),
    ("새봄증권", "Organization", False, 133, 133, None),
    ("두리은행", "Organization", False, 131, 131, None),
    ("의원", "Organization", False, 127, 127, None),
    ("1,200억", "Money", False, 126, 126, None),
    ("35.2%", "Percentage", False, 126, 126, None),
    ("강남구", "Location", False, 126, 126, None),
    ("부동", "Location", False, 126, 126, None),
    ("서울", "Location", True, 126, 126, "Q8684"),
    ("외교부", "Organization", False, 122, 122, None),
    ("환경부", "Organization", False, 116, 116, None),
    ("국방부", "Organization", False, 110, 110, None),
    ("진보당", "Organization", False, 58, 58, None),
    ("박민재", "Person", False, 54, 54, None),
    ("정의당", "Organization", False, 53, 53, None),
    ("정하늘", "Person", False, 52, 52, None),
    ("국민의힘", "Organization", True, 50, 50, "Q96165405"),
    ("강태오", "Person", False, 48, 48, None),
    ("최은우", "Person", False, 48, 48, None),
    ("김수종", "Person", False, 43, 43, None),
    ("한지민", "Person", False, 42, 42, None),
    ("이서연", "Person", False, 39, 39, None),
    ("환경부", "Person", False, 32, 32, None),
    ("국방부", "Person", False, 30, 30, None),
    ("외교부", "Person", False, 30, 30, None),
    ("두리은행", "Person", False, 24, 24, None),
    ("새봄증권", "Person", False, 24, 24, None),
    ("프트테크", "Person", False, 23, 23, None),
    ("한빛전자", "Person", False, 18, 18, None),
    ("한솔건설", "Person", False, 18, 18, None),
]


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def ontology_triples_oracle() -> str:
    """DuckDB SQL producing the constant expected aggregate, with the same
    column names and types as the Spark query (counts BIGINT, confidence
    DOUBLE rounded to 6)."""
    rows = ",\n              ".join(
        "(" + ", ".join(_lit(v) for v in r) + ")"
        for r in ONTOLOGY_TRIPLES_GOLDEN
    )
    return (
        "SELECT predicate, predicate_label,\n"
        "       CAST(n_triples AS BIGINT) AS n_triples,\n"
        "       CAST(n_subjects AS BIGINT) AS n_subjects,\n"
        "       ROUND(CAST(avg_confidence AS DOUBLE), 6) AS avg_confidence\n"
        f"FROM (VALUES {rows})\n"
        "  AS t(predicate, predicate_label, n_triples, n_subjects,"
        " avg_confidence)"
    )


def entity_linking_oracle() -> str:
    rows = ",\n              ".join(
        "(" + ", ".join(_lit(v) for v in r) + ")"
        for r in ENTITY_LINKING_GOLDEN
    )
    return (
        "SELECT canonical, entity_type,\n"
        "       CAST(in_knowledge_base AS BOOLEAN) AS in_knowledge_base,\n"
        "       CAST(mentions AS BIGINT) AS mentions,\n"
        "       CAST(n_docs AS BIGINT) AS n_docs,\n"
        "       CAST(wikidata AS VARCHAR) AS wikidata\n"
        f"FROM (VALUES {rows})\n"
        "  AS t(canonical, entity_type, in_knowledge_base, mentions,"
        " n_docs, wikidata)"
    )
