"""Relational/analytics operators: trends, dedup, similarity, text analysis.

Everything here is expressed with built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen) — no Python UDFs in these hot paths.
"""
