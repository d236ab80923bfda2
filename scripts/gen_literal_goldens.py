"""Generate the literal golden rows for the ontology_triples and
entity_linking oracle queries.

The press-style corpus is a pure function of n_docs
(baram_spark/corpus.py ontology_docs: doc i's sentences are
index-rotations of a fixed template bank), so both driver queries have a
CONSTANT result independent of sf_dir. This script runs each query once,
cross-checks the pinned pytest goldens (tests/test_ontology.py /
tests/test_linker.py) as an independent guard, and prints the python
literal to paste into baram_spark/goldens.py.

Run: python scripts/gen_literal_goldens.py
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

import __spark_entry__ as entry


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("gen-literal-goldens")
        .getOrCreate()
    )
    qs = entry.queries()

    ont = qs["ontology_triples"](spark, "unused").collect()
    # pinned pytest goldens as an independent cross-check
    assert len(ont) == 14, len(ont)
    assert sum(r["n_triples"] for r in ont) == 1839
    by_pred = {(r["predicate"], r["predicate_label"]): r for r in ont}
    assert by_pred[("schema:worksFor", "근무")]["n_triples"] == 103
    assert by_pred[("schema:memberOf", "소속")]["n_triples"] == 127
    assert by_pred[("schema:investor", "투자")]["n_triples"] == 330

    link = qs["entity_linking"](spark, "unused").collect()
    assert len(link) == 39, len(link)
    assert sum(r["mentions"] for r in link) == 3890
    by_canon = {r["canonical"]: r for r in link}
    assert by_canon["더불어민주당"]["mentions"] == 277
    assert by_canon["더불어민주당"]["wikidata"] == "Q21207862"
    assert len([r for r in link if r["in_knowledge_base"]]) == 5

    print("ONTOLOGY_TRIPLES_GOLDEN = [")
    for r in ont:
        print(
            "    (%r, %r, %d, %d, %r)," % (
                r["predicate"], r["predicate_label"], r["n_triples"],
                r["n_subjects"], r["avg_confidence"],
            )
        )
    print("]")
    print()
    print("ENTITY_LINKING_GOLDEN = [")
    for r in link:
        print(
            "    (%r, %r, %r, %d, %d, %r)," % (
                r["canonical"], r["entity_type"], r["in_knowledge_base"],
                r["mentions"], r["n_docs"], r["wikidata"],
            )
        )
    print("]")
    spark.stop()


if __name__ == "__main__":
    main()
