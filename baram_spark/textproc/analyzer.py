"""Deterministic nori-style analyzer chain (index + search analyzers).

The reference delegates analysis to OpenSearch's nori plugin with a pinned
configuration (``/root/reference/src/embedding/mod.rs:247-276``):

    nori_tokenizer(decompound_mode="mixed", discard_punctuation=true)
    filters = [lowercase, nori_posfilter(stoptags=[IC, MAG, MM, SP, SSC,
               SSO, SC, SE, XPN, XSA, XSN, XSV]), nori_readingform]

The search analyzer is identical minus ``nori_readingform``
(``src/embedding/mod.rs:261-264``).

Nori's mecab-ko dictionary is not redistributable here, so this module pins a
deterministic from-scratch equivalent with the same chain shape:

- tokenize: script-run segmentation (Hangul / Latin+digit runs); punctuation
  and symbols are discarded (``discard_punctuation: true``).
- Hangul runs: greedy longest-match segmentation against a pinned lexicon;
  dictionary compounds emit compound + parts (``decompound_mode: "mixed"``);
  one trailing particle (조사) is split off as its own token (nori keeps
  josa — J* tags are NOT in the reference stoptag list).
- posfilter: drops tokens tagged IC/MAG/MM (pinned word lists);
  punctuation classes (S*) never materialize as tokens. The reference's
  XS* affix stoptags have no analog here: this segmenter never splits
  affixes off as separate tokens, so there is nothing to drop.
- lowercase.
- readingform: pinned Hanja→Hangul reading map (index analyzer only).

Behavior is pinned by golden tests (the same way the reference pins nori via
index settings); both analyzers are pure functions usable inside Arrow UDFs.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd

# Script-run tokenizer: Hangul runs | Latin/digit runs | standalone digits.
_TOKEN_RE = re.compile(r"[가-힣]+|[A-Za-z0-9]+(?:[.'][A-Za-z0-9]+)*")

# --- pinned lexicon ---------------------------------------------------------
# Compounds that decompound in "mixed" mode: compound -> parts.
DECOMPOUND: dict[str, tuple[str, ...]] = {
    "대한민국": ("대한", "민국"),
    "인공지능": ("인공", "지능"),
    "검색엔진": ("검색", "엔진"),
    "자연어처리": ("자연어", "처리"),
    "빅데이터": ("빅", "데이터"),
    "머신러닝": ("머신", "러닝"),
    "데이터베이스": ("데이터", "베이스"),
    "분산처리": ("분산", "처리"),
    "색인구축": ("색인", "구축"),
    "뉴스기사": ("뉴스", "기사"),
}

# Single-word lexicon entries (segmentation anchors), including decompound
# parts so greedy matching can find them inside unknown runs.
_LEXICON: set[str] = set(DECOMPOUND) | {p for ps in DECOMPOUND.values() for p in ps} | {
    "뉴스", "기사", "경제", "정치", "사회", "문화", "세계", "과학", "스포츠",
    "연예", "기자", "오늘", "내일", "시장", "정부", "국회", "대통령", "회사",
    "서울", "부산", "한국", "미국", "중국", "일본", "발표", "조사", "결과",
    "검색", "색인", "질의", "문서", "단어", "엔진", "지능", "처리", "데이터",
}
_MAX_WORD = max(len(w) for w in _LEXICON)

# Trailing particles (조사); kept as separate tokens like nori does.
PARTICLES: tuple[str, ...] = tuple(
    sorted(
        [
            "으로부터", "에서부터", "로부터", "에게서", "으로서", "으로써",
            "까지", "부터", "에서", "에게", "으로", "이나", "라도", "조차",
            "마저", "은", "는", "이", "가", "을", "를", "에", "의", "와",
            "과", "도", "만", "로", "나",
        ],
        key=len,
        reverse=True,
    )
)

# POS-stoplist word lists (IC interjections, MAG adverbs, MM determiners).
STOP_IC = {"아", "어머", "아이고", "우와", "네", "예", "응"}
STOP_MAG = {"매우", "아주", "정말", "너무", "빨리", "곧", "이미", "다시", "함께"}
STOP_MM = {"이런", "그런", "저런", "어느", "무슨", "새", "헌", "온갖"}
_STOPWORDS = STOP_IC | STOP_MAG | STOP_MM

# Pinned Hanja → Hangul reading map (nori_readingform analog).
HANJA_READINGS: dict[str, str] = {
    "韓": "한", "國": "국", "美": "미", "中": "중", "日": "일",
    "大": "대", "統": "통", "領": "령", "政": "정", "府": "부",
    "經": "경", "濟": "제", "新": "신", "聞": "문",
}
_HANJA_RE = re.compile("[" + "".join(HANJA_READINGS) + "]")


@lru_cache(maxsize=262144)
def _strip_particle(run: str) -> tuple[str, str | None]:
    """Split one trailing particle off a Hangul run (longest match)."""
    for p in PARTICLES:
        if run.endswith(p) and len(run) > len(p):
            return run[: -len(p)], p
    return run, None


@lru_cache(maxsize=262144)
def _segment_hangul_cached(run: str) -> tuple[str, ...]:
    return tuple(_segment_hangul_impl(run))


def _segment_hangul(run: str) -> list[str]:
    return list(_segment_hangul_cached(run))


def _segment_hangul_impl(run: str) -> list[str]:
    """Greedy longest-match over the pinned lexicon; mixed decompounding.

    Lexicon lookup takes PRIORITY over particle stripping: a run that is
    itself a dictionary word ('결과', '질의' — words whose last syllable
    happens to spell a particle) must segment as that word, exactly as a
    real morpheme dictionary would; stripping first would corrupt the
    bare form ('결과' → 결+과) while the inflected form ('결과가')
    resolved correctly, and query/doc tokens would never meet."""
    if run in _LEXICON and run not in DECOMPOUND:
        return [run]
    stem, particle = _strip_particle(run)
    tokens: list[str] = []
    i, n = 0, len(stem)
    unknown_start = -1

    def flush_unknown(end: int):
        nonlocal unknown_start
        if unknown_start >= 0:
            tokens.append(stem[unknown_start:end])
            unknown_start = -1

    while i < n:
        matched = None
        for length in range(min(_MAX_WORD, n - i), 0, -1):
            if length == 1 and stem[i] not in _LEXICON:
                break  # single chars match only as explicit entries
            cand = stem[i : i + length]
            if cand in _LEXICON:
                matched = cand
                break
        if matched is not None:
            flush_unknown(i)
            parts = DECOMPOUND.get(matched)
            if parts:
                tokens.append(matched)  # mixed mode: compound ...
                tokens.extend(parts)  # ... followed by its parts
            else:
                tokens.append(matched)
            i += len(matched)
        else:
            if unknown_start < 0:
                unknown_start = i
            i += 1
    flush_unknown(n)
    if particle is not None:
        tokens.append(particle)
    return tokens


def _readingform(token: str) -> str:
    return _HANJA_RE.sub(lambda m: HANJA_READINGS[m.group(0)], token)


def analyze(text: str, *, search: bool = False) -> list[str]:
    """Analyzer chain; ``search=True`` = search analyzer (no readingform)."""
    if not text:
        return []
    if not search:
        # readingform runs before tokenization here so converted Hanja joins
        # adjacent Hangul runs the way nori's single-pass lattice would.
        text = _readingform(text)
    tokens: list[str] = []
    for m in _TOKEN_RE.finditer(text):
        run = m.group(0)
        if "가" <= run[0] <= "힣":
            tokens.extend(_segment_hangul(run))
        else:
            tokens.append(run.lower())
    return [t for t in tokens if t not in _STOPWORDS]


def analyze_index(text: str) -> list[str]:
    """Index-time analyzer (with readingform)."""
    return analyze(text, search=False)


def analyze_search(text: str) -> list[str]:
    """Query-time analyzer (without readingform)."""
    return analyze(text, search=True)


def analyze_series(s: pd.Series, *, search: bool = False) -> pd.Series:
    """Vectorized batch entry point for Arrow UDFs: Series[str] → Series[list]."""
    return s.fillna("").map(lambda t: analyze(t, search=search))
