"""Text chunking — sliding-window and sentence-boundary (A4/A5).

Re-implements the reference chunkers as pure functions with pinned
deterministic tokenization (whitespace tokens with char offsets, standing in
for the HF tokenizer the reference loads at runtime):

- ``chunk_text``:           /root/reference/src/embedding/tokenizer.rs:185-259
  windows of ``max_tokens`` stepping by ``max_tokens - overlap_tokens``;
  chunks smaller than ``min_chunk_tokens`` are dropped unless final; char
  start/end positions come from token offsets.
- ``chunk_text_sentences``: tokenizer.rs:262-327 — greedy sentence packing
  with ~20%-of-words overlap carried between chunks.
- ``split_sentences``:      tokenizer.rs:355-380 — ./!/?/。/！/？ boundaries
  followed by whitespace/quote (or end of text).

``chunk_docs`` is the Spark surface: docs → exploded chunk rows
(doc_id, chunk_index, total_chunks, text, token_count, start_pos, end_pos),
computed inside an Arrow-batched mapInPandas (no shuffle).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame

_TOKEN_OFFSET_RE = re.compile(r"\S+")
_SENT_END = (".", "!", "?", "。", "！", "？")

DEFAULT_MAX_TOKENS = 512
DEFAULT_OVERLAP = 64
DEFAULT_MIN_CHUNK = 32


@dataclass
class TextChunk:
    text: str
    token_count: int
    chunk_index: int
    total_chunks: int
    start_pos: int
    end_pos: int


def _token_offsets(text: str) -> list[tuple[int, int]]:
    return [(m.start(), m.end()) for m in _TOKEN_OFFSET_RE.finditer(text)]


def chunk_text(
    text: str,
    max_tokens: int = DEFAULT_MAX_TOKENS,
    overlap_tokens: int = DEFAULT_OVERLAP,
    min_chunk_tokens: int = DEFAULT_MIN_CHUNK,
) -> list[TextChunk]:
    """Sliding-window chunking (tokenizer.rs:185-259 semantics)."""
    offsets = _token_offsets(text)
    n = len(offsets)
    if n <= max_tokens:
        return [TextChunk(text, n, 0, 1, 0, len(text))]
    if overlap_tokens >= max_tokens:
        # a non-positive step would walk backwards through negative
        # indices emitting garbage chunks before an IndexError (the Rust
        # reference's usize subtraction traps here too — but only when
        # the text is actually long enough to chunk, hence the order)
        raise ValueError(
            f"overlap_tokens={overlap_tokens} must be < "
            f"max_tokens={max_tokens}"
        )
    chunks: list[TextChunk] = []
    step = max_tokens - overlap_tokens
    start_idx = 0
    while start_idx < n:
        end_idx = min(start_idx + max_tokens, n)
        start_pos = offsets[start_idx][0]
        end_pos = offsets[end_idx - 1][1]
        token_count = end_idx - start_idx
        if token_count >= min_chunk_tokens or start_idx + step >= n:
            chunks.append(
                TextChunk(
                    text[start_pos:end_pos], token_count, len(chunks), 0,
                    start_pos, end_pos,
                )
            )
        start_idx += step
        if step == 0:
            break
    total = len(chunks)
    for c in chunks:
        c.total_chunks = total
    return chunks


def split_sentences(text: str) -> list[str]:
    """Sentence boundary split (tokenizer.rs:355-380 semantics)."""
    sentences: list[str] = []
    start = 0
    chars = list(text)
    for i, c in enumerate(chars):
        if c in _SENT_END:
            nxt = chars[i + 1] if i + 1 < len(chars) else None
            if nxt is None or nxt.isspace() or nxt in ('"', "'"):
                end = i + 1
                if end > start:
                    sentences.append(text[start:end])
                    start = end
    if start < len(text) and text[start:].strip():
        sentences.append(text[start:])
    return sentences


def _overlap_text(text: str, _target_tokens: int) -> str:
    """Last ~20% of words (tokenizer.rs:383-388)."""
    words = text.split()
    overlap_words = max(len(words) // 5, 1)
    return " ".join(words[len(words) - overlap_words :])


def chunk_text_sentences(
    text: str,
    max_tokens: int = DEFAULT_MAX_TOKENS,
    overlap_tokens: int = DEFAULT_OVERLAP,
    min_chunk_tokens: int = DEFAULT_MIN_CHUNK,
) -> list[TextChunk]:
    """Sentence-preserving chunking (tokenizer.rs:262-327 semantics).

    FAITHFUL QUIRK — do not "fix": like the reference, the running chunk
    is built as ``sentence + ' '`` joins (so its text is NOT a substring
    of the source when sentences carry leading whitespace), and
    ``start_pos``/``end_pos`` are back-computed from the join-string
    length (tokenizer.rs:283-298: ``chunk_start = chunk_end -
    current_chunk.len()``) — they do NOT reliably index the original
    text. Consumers needing source-exact offsets must use the
    token-window chunker (:func:`chunk_text`), whose offsets come from
    real token positions (tokenizer.rs:215-223)."""
    sentences = split_sentences(text)
    chunks: list[TextChunk] = []
    current = ""
    current_tokens = 0
    chunk_start = 0
    for sentence in sentences:
        sent_tokens = len(sentence.split())
        if current_tokens + sent_tokens > max_tokens and current:
            chunk_end = chunk_start + len(current)
            chunks.append(
                TextChunk(current.strip(), current_tokens, len(chunks), 0,
                          chunk_start, chunk_end)
            )
            overlap = _overlap_text(current, overlap_tokens)
            current = overlap
            current_tokens = len(overlap.split())
            chunk_start = chunk_end - len(current)
        current += sentence + " "
        current_tokens += sent_tokens
    if current_tokens >= min_chunk_tokens or not chunks:
        chunk_end = chunk_start + len(current)
        chunks.append(
            TextChunk(current.strip(), current_tokens, len(chunks), 0,
                      chunk_start, chunk_end)
        )
    total = len(chunks)
    for c in chunks:
        c.total_chunks = total
    return chunks


CHUNKS_SCHEMA = (
    "doc_id long, chunk_index int, total_chunks int, chunk_text string, "
    "token_count int, start_pos int, end_pos int"
)


def chunk_docs(
    docs: DataFrame,
    max_tokens: int = DEFAULT_MAX_TOKENS,
    overlap_tokens: int = DEFAULT_OVERLAP,
    min_chunk_tokens: int = DEFAULT_MIN_CHUNK,
    sentences: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """docs → one row per chunk (narrow Arrow-batched stage, no shuffle)."""
    fn = chunk_text_sentences if sentences else chunk_text

    def run(iterator):
        for pdf in iterator:
            out = {k: [] for k in (
                "doc_id", "chunk_index", "total_chunks", "chunk_text",
                "token_count", "start_pos", "end_pos",
            )}
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                for c in fn(text or "", max_tokens, overlap_tokens,
                            min_chunk_tokens):
                    out["doc_id"].append(doc_id)
                    out["chunk_index"].append(c.chunk_index)
                    out["total_chunks"].append(c.total_chunks)
                    out["chunk_text"].append(c.text)
                    out["token_count"].append(c.token_count)
                    out["start_pos"].append(c.start_pos)
                    out["end_pos"].append(c.end_pos)
            yield pd.DataFrame(out)

    return docs.select(id_col, text_col).mapInPandas(run, schema=CHUNKS_SCHEMA)
