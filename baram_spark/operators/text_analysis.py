"""Text-analysis operators for training-data pipelines.

Language ID (n-gram/stopword heuristic), quality scoring, token counting,
and document fingerprinting over a ``documents(doc_id, text, ...)`` table.
All pure ``pyspark.sql.functions`` — codegen'd, shuffle-free per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny pinned stopword profiles for the heuristic language ID
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "ko": ["이", "그", "은", "는", "을"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "y"],
}


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Whitespace + word-run token counts per doc.

    ``n_tokens``: whitespace tokens; ``n_words``: runs of word
    characters (letters/digits/hangul), a deterministic proxy for
    tokenizer cost estimation; ``n_chars``: raw length.
    """
    trimmed = F.trim(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        # split('') returns [''] (size 1) — empty/whitespace-only text
        # must count ZERO tokens, or quality filters pass empty docs
        F.when(trimmed == "", F.lit(0))
        .otherwise(F.size(F.split(trimmed, r"\s+")))
        .alias("n_tokens"),
        F.size(
            F.expr(
                f"filter(split(`{text_col}`, '[^a-zA-Z0-9가-힣]+'), "
                "x -> x != '')"
            )
        ).alias("n_words"),
        F.length(text_col).alias("n_chars"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: length, punctuation ratio, mean word
    length, distinct-token ratio — the usual pre-training filters."""
    trimmed = F.trim(F.col(text_col))
    toks = F.split(trimmed, r"\s+")
    # empty/whitespace-only text is ZERO tokens (split('') → [''])
    n_toks = F.when(trimmed == "", F.lit(0)).otherwise(F.size(toks))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("n_chars"),
        n_toks.alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace(text_col, r"[^.,!?;:]", "")) /
            F.greatest(F.length(text_col), F.lit(1)),
            6,
        ).alias("punct_ratio"),
        # mean of ACTUAL token lengths (summing lengths, not the
        # len(text)-n+1 shortcut, which overcounts when tokens are
        # separated by runs of whitespace); zero tokens → 0.0, not 1.0
        F.round(
            F.when(n_toks == 0, F.lit(0.0)).otherwise(
                F.aggregate(
                    toks, F.lit(0),
                    lambda acc, x: acc + F.length(x),
                ).cast("double")
                / F.greatest(n_toks, F.lit(1))
            ),
            6,
        ).alias("avg_word_len"),
        F.round(
            F.when(trimmed == "", F.lit(0))
            .otherwise(F.size(F.array_distinct(toks)))
            / F.greatest(n_toks, F.lit(1)),
            6,
        ).alias("uniq_ratio"),
    )


def language_id(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language ID: argmax over marker-token hit counts.

    Deterministic tie-break by language code; 'und' when nothing matches.
    """
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    scores = []
    for lang, markers in sorted(_LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append((lang, score))
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    for lang, score in reversed(scores):
        pred = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return docs.select(F.col(id_col).alias("doc_id"), pred.alias("lang_pred"))


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Normalized-content fingerprint: md5 of lowercased,
    whitespace-collapsed text (rolling-hash class; stable across
    formatting-only edits)."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(normalized).alias("fingerprint"),
    )
