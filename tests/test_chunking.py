"""Chunking semantics (tokenizer.rs:185-392 re-derived expectations)."""

from baram_spark.textproc.chunking import (
    chunk_text,
    chunk_text_sentences,
    split_sentences,
)


def test_single_chunk_when_small():
    text = "one two three"
    chunks = chunk_text(text, max_tokens=10)
    assert len(chunks) == 1
    assert chunks[0].text == text
    assert chunks[0].token_count == 3
    assert (chunks[0].start_pos, chunks[0].end_pos) == (0, len(text))


def test_sliding_window_overlap():
    words = [f"w{i}" for i in range(20)]
    text = " ".join(words)
    chunks = chunk_text(text, max_tokens=8, overlap_tokens=2, min_chunk_tokens=2)
    # step = 6 → windows at 0, 6, 12, 18
    assert [c.token_count for c in chunks] == [8, 8, 8, 2]
    assert chunks[0].text.split()[-2:] == chunks[1].text.split()[:2]  # overlap
    assert all(c.total_chunks == 4 for c in chunks)
    # char offsets reconstruct the text exactly
    for c in chunks:
        assert text[c.start_pos : c.end_pos] == c.text


def test_small_tail_dropped_unless_last():
    words = [f"w{i}" for i in range(11)]
    chunks = chunk_text(" ".join(words), max_tokens=8, overlap_tokens=2,
                        min_chunk_tokens=4)
    # windows: [0:8], [6:11] (5 tokens >= min) — both kept
    assert [c.token_count for c in chunks] == [8, 5]


def test_split_sentences():
    text = "Hello world. 안녕하세요! Third? No.Split here"
    sents = split_sentences(text)
    assert sents[0] == "Hello world."
    assert sents[1] == " 안녕하세요!"
    assert sents[2] == " Third?"
    # "No.Split" — '.' followed by letter is NOT a boundary
    assert sents[3] == " No.Split here"


def test_sentence_chunking_packs_greedily():
    sents = [f"Sentence number {i} here." for i in range(10)]
    text = " ".join(sents)
    chunks = chunk_text_sentences(text, max_tokens=10, overlap_tokens=2,
                                  min_chunk_tokens=1)
    assert len(chunks) > 1
    assert all(c.token_count <= 14 for c in chunks)  # max + carried overlap
    assert chunks[-1].total_chunks == len(chunks)


def test_chunk_docs_spark(spark):
    from baram_spark.textproc.chunking import chunk_docs

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20))), (2, "short text")],
        "doc_id long, text string",
    )
    rows = chunk_docs(df, max_tokens=8, overlap_tokens=2,
                      min_chunk_tokens=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 4
    assert len(by_doc[2]) == 1


def test_overlap_ge_max_tokens_raises():
    """A non-positive window step must raise (the old code walked
    backwards through negative indices emitting garbage chunks); small
    texts that never chunk keep accepting any overlap."""
    import pytest

    long_text = " ".join(f"t{i}" for i in range(100))
    with pytest.raises(ValueError, match="must be <"):
        chunk_text(long_text, max_tokens=8, overlap_tokens=12)
    # short text: single chunk regardless of overlap (reference order)
    assert len(chunk_text("a b c", max_tokens=10)) == 1
