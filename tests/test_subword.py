"""From-scratch byte-level BPE (A3, tokenizer.rs:143-181 analog):
lossless encode/decode round trip, deterministic training, distributed
word counts == local counts, and the mapInPandas operator."""

import numpy as np
import pytest

from baram_spark.textproc.subword import (
    BpeTokenizer,
    bpe_word_counts,
    pretokenize,
    subword_tokenize,
    train_bpe,
    train_bpe_spark,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "서울 경제 뉴스: 금리 인상 발표",
    "서울 날씨는 맑음, 경제 지표는 혼조",
    "low lower lowest newer newest widest",
    "low low low lower lower newest",
]


def _local_counts(texts):
    from collections import Counter

    c = Counter()
    for t in texts:
        for w in pretokenize(t):
            c[w.encode("utf-8")] += 1
    return dict(c)


def test_pretokenize_is_lossless_partition():
    for t in CORPUS + ["", "  leading", "trailing  ", "a  b\t\nc"]:
        assert "".join(pretokenize(t)) == t


def test_train_deterministic_and_merges_grow_vocab():
    counts = _local_counts(CORPUS)
    m1 = train_bpe(counts, vocab_size=300)
    m2 = train_bpe(dict(reversed(list(counts.items()))), vocab_size=300)
    assert m1 == m2  # input order must not matter
    tok = BpeTokenizer(m1)
    assert tok.vocab_size == 256 + len(m1)
    # frequent words compress: "the" must fall below 3 byte-tokens
    assert len(tok.encode("the")) < 3


def test_encode_decode_roundtrip_lossless():
    tok = BpeTokenizer(train_bpe(_local_counts(CORPUS), vocab_size=400))
    for t in CORPUS + ["unseen français текст 漢字 🙂  mixed"]:
        ids = tok.encode(t)
        assert tok.decode(ids) == t  # byte-level: zero UNK, lossless
        assert tok.count_tokens(t) == len(ids)
    # unseen text still encodes (falls back toward raw bytes)
    assert tok.encode("zzzqqq")


def test_more_merges_never_increase_token_count():
    counts = _local_counts(CORPUS)
    small = BpeTokenizer(train_bpe(counts, vocab_size=280))
    big = BpeTokenizer(train_bpe(counts, vocab_size=450))
    for t in CORPUS:
        assert big.count_tokens(t) <= small.count_tokens(t)


def test_spark_word_counts_match_local(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                               "doc_id long, text string")
    got = bpe_word_counts(df, "text")
    assert got == _local_counts(CORPUS)


def test_spark_training_and_operator(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                               "doc_id long, text string")
    tok = train_bpe_spark(df, "text", vocab_size=350)
    local = BpeTokenizer(train_bpe(_local_counts(CORPUS), vocab_size=350))
    assert tok.merges == local.merges  # distributed == local training

    out = {r["doc_id"]: r for r in subword_tokenize(df, tok).collect()}
    assert len(out) == len(CORPUS)
    for i, t in enumerate(CORPUS):
        ids = tok.encode(t)
        assert list(out[i]["token_ids"]) == ids
        assert out[i]["token_count"] == len(ids)
        assert tok.decode(list(out[i]["token_ids"])) == t

    # shuffle-free plan: no Exchange in the operator's physical plan
    plan = subword_tokenize(df, tok)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_documents_table_end_to_end(spark):
    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    tok = train_bpe_spark(docs, "text", vocab_size=600,
                          max_word_types=20_000)
    rows = subword_tokenize(docs, tok).collect()
    assert len(rows) == 200
    texts = {r["doc_id"]: r["text"]
             for r in docs.select("doc_id", "text").collect()}
    sample = rows[:20]
    for r in sample:
        assert tok.decode(list(r["token_ids"])) == texts[r["doc_id"]]
        assert r["token_count"] == len(r["token_ids"])
    # compression: subword count strictly below byte count on real text
    total_tokens = sum(r["token_count"] for r in rows)
    total_bytes = sum(len(t.encode("utf-8")) for t in texts.values())
    assert total_tokens < total_bytes * 0.7


# -- property-based (hypothesis) --------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_PROP_TOK = BpeTokenizer(train_bpe(_local_counts(CORPUS), vocab_size=400))


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_any_text_roundtrips_losslessly(t):
    ids = _PROP_TOK.encode(t)
    assert _PROP_TOK.decode(ids) == t
    assert all(0 <= i < _PROP_TOK.vocab_size for i in ids)


@given(st.text(max_size=200), st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_concatenated_text_roundtrips(a, b):
    # merges may cross the join point's pre-token boundary differently
    # than in either part alone — decode must still be lossless
    ids = _PROP_TOK.encode(a + b)
    assert _PROP_TOK.decode(ids) == a + b
