"""Deterministic synthetic Common-Crawl-style page corpus (M0).

Generates the ``pages`` input table of `BASELINE.json.input_hint`:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
with the five Baram page shapes (general / entertainment / sports / card /
deleted — see ``/root/reference/tests/fixtures/html/`` and
``/root/reference/src/parser/selectors.rs:16-172``), sanitize-chain dirt
(zero-width chars, HTML entities, noise elements, whitespace runs), a 10%
EUC-KR-encoded slice (charset chain ``src/crawler/fetcher.rs:339-372``), and
a Zipfian (s≈1.1) mixed Hangul/ASCII vocabulary so posting lists are skewed
like real text (the top term appears in nearly every document).

Every row is a pure function of its index ``i`` (per-row seeded RNG), so
distributed generation via ``spark.range(n).mapInPandas`` is deterministic
under any partitioning — the same property that makes the corpus usable as
a fixed correctness oracle. The ``text`` column carries the EXPECTED
byte-exact extraction output, built analytically from the clean parts the
generator embedded (it never calls the DOM extractor, keeping the
golden check independent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from html import unescape as _html_unescape

from .textproc.sanitize import sanitize_text

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.1

# EUC-KR-encodable (KS X 1001) common syllables → every generated Hangul term
# survives the euc-kr encode path.
_SYLLABLES = (
    "가 나 다 라 마 바 사 아 자 차 카 타 파 하 간 난 단 란 만 반 산 안 잔 찬 "
    "강 남 당 랑 망 방 상 앙 장 창 거 너 더 러 머 버 서 어 저 처 건 넌 던 런 "
    "게 네 데 레 메 베 세 에 제 체 고 노 도 로 모 보 소 오 조 초 곡 녹 독 록 "
    "구 누 두 루 무 부 수 우 주 추 국 눈 둘 률 문 불 술 울 줄 출 그 느 드 르 "
    "므 브 스 으 즈 츠 기 니 디 리 미 비 시 이 지 치 김 닌 딘 린 민 빈 신 인"
).split()

_ASCII_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda sigma "
    "data spark index query search engine token score shard block posting "
    "news media press article cloud model graph vector merge batch"
).split()


def _build_vocab() -> list[str]:
    rng = np.random.default_rng(SEED)
    vocab: list[str] = []
    seen = set()
    while len(vocab) < VOCAB_SIZE:
        if rng.random() < 0.7:
            n_syl = int(rng.integers(2, 5))
            w = "".join(rng.choice(_SYLLABLES, size=n_syl))
        else:
            w = str(rng.choice(_ASCII_WORDS)) + str(int(rng.integers(0, 100)))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


VOCAB = _build_vocab()

# Zipf rank weights (s≈1.1) over the vocab, precomputed once.
_RANKS = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
_WEIGHTS = _RANKS ** (-ZIPF_S)
_WEIGHTS /= _WEIGHTS.sum()
_CUM_WEIGHTS = np.cumsum(_WEIGHTS)

_BASE_TS = np.datetime64("2024-11-15T00:00:00")

_DIRT_ZW = "\u200b"
_PUBLISHERS = ["바람일보", "스파크뉴스", "데이터타임스", "Naver News", "검색신문"]
_AUTHORS = ["김기자", "이기자", "박기자", None, None]


def _sample_terms(rng: np.random.Generator, n: int) -> list[str]:
    # the cumsum tail is ~1-3e-15 below 1.0: a draw inside that sliver
    # would index VOCAB[len(VOCAB)] — clamp (deterministic per seed, so
    # a big-enough corpus WOULD always crash at the same row)
    idx = np.minimum(np.searchsorted(_CUM_WEIGHTS, rng.random(n)),
                     len(VOCAB) - 1)
    return [VOCAB[i] for i in idx]


def _paragraph(rng: np.random.Generator) -> str:
    return " ".join(_sample_terms(rng, int(rng.integers(10, 40))))


def _dirty(text: str, rng: np.random.Generator) -> str:
    """Inject sanitize-chain dirt that cleans back to the original text."""
    words = text.split(" ")
    out = []
    for w in words:
        r = rng.random()
        if r < 0.05 and len(w) > 2:
            w = w[:1] + _DIRT_ZW + w[1:]  # zero-width removed by sanitize
        elif r < 0.08:
            w = w + "&#8203;"  # numeric zero-width entity
        out.append(w)
    sep_dirty = "  " if rng.random() < 0.2 else " "
    return sep_dirty.join(out)


_NOISE_SNIPPETS = [
    '<script>var ad_slot = "{}";</script>',
    '<div class="ad_wrap"><a href="#">AD {}</a></div>',
    '<em class="img_desc">사진 설명 {}</em>',
    '<div class="copyright">ⓒ 무단전재 금지 {}</div>',
    '<div class="link_news"><a href="/a/{}">관련기사</a></div>',
]


def _noise(rng: np.random.Generator) -> str:
    tpl = _NOISE_SNIPPETS[int(rng.integers(0, len(_NOISE_SNIPPETS)))]
    return tpl.format(int(rng.integers(0, 10_000)))


def make_page(i: int) -> dict:
    """Generate page row ``i`` (pure function of i; seed folded with SEED)."""
    rng = np.random.default_rng(np.random.SeedSequence([SEED, i]))
    oid = f"{int(rng.integers(1, 999)):03d}"
    aid = f"{i:010d}"
    url = f"https://n.news.naver.com/mnews/article/{oid}/{aid}"
    warc_ts = _BASE_TS + np.timedelta64(int(rng.integers(0, 30 * 24 * 3600)), "s")
    shape_r = rng.random()
    lang = "ko" if rng.random() < 0.8 else "en"

    if shape_r < 0.05:  # deleted page
        html = (
            "<html><head><title>삭제된 기사입니다</title></head>"
            "<body><div class='error_content'>기사가 삭제, 수정, 이동되었거나 "
            "주소가 변경되었습니다.</div></body></html>"
        )
        return {
            "url": url, "warc_ts": warc_ts, "html": html.encode("utf-8"),
            "text": None, "lang": lang, "title": None, "shape": "deleted",
        }

    title_clean = " ".join(_sample_terms(rng, int(rng.integers(3, 8))))
    paragraphs = [_paragraph(rng) for _ in range(int(rng.integers(3, 8)))]
    date_str = "2024.12.%02d. %02d:%02d" % (
        int(rng.integers(1, 28)), int(rng.integers(0, 24)), int(rng.integers(0, 60)),
    )
    publisher = _PUBLISHERS[int(rng.integers(0, len(_PUBLISHERS)))]
    author = _AUTHORS[int(rng.integers(0, len(_AUTHORS)))]

    # visible body markup: dirty paragraphs + noise elements between them.
    # ``visible_bits`` tracks what survives noise removal: the noise element
    # itself is string-replaced away but its "\n" separators remain.
    body_bits: list[str] = []
    visible_bits: list[str] = []
    for p in paragraphs:
        dirty = _dirty(p, rng)
        body_bits.append(dirty)
        visible_bits.append(dirty)
        if rng.random() < 0.5:
            body_bits.append(_noise(rng))
            visible_bits.append("")
    body_html = "\n".join(body_bits)

    # Expected extracted content, built analytically: the DOM parse decodes
    # entities once (so "&#8203;" becomes a real zero-width BEFORE the
    # sanitize chain sees it), then the sanitize chain (pinned separately by
    # golden unit tests) cleans the dirt back out.
    expected_content = sanitize_text(_html_unescape("\n".join(visible_bits)))

    if shape_r < 0.65:  # general
        shape = "general"
        html = f"""<html><head><title>{title_clean}</title></head><body>
<div class="media_end_head_top_logo"><img alt="{publisher}" src="/logo.png"></div>
<div id="title_area"><span>{title_clean}</span></div>
<span class="media_end_head_info_datestamp_time">{date_str}</span>
{'<span class="byline_s">' + author + '</span>' if author else ''}
<article id="dic_area">{body_html}</article>
<div class="copyright">ⓒ news</div>
</body></html>"""
    elif shape_r < 0.77:  # entertainment
        shape = "entertainment"
        html = f"""<html><head><title>{title_clean}</title></head><body>
<h2 class="end_tit">{title_clean}</h2>
<div class="article_info"><span class="author"><em>{date_str}</em></span></div>
<em class="press_name">{publisher}</em>
<div class="article_body">{body_html}</div>
</body></html>"""
    elif shape_r < 0.89:  # sports
        shape = "sports"
        html = f"""<html><head><title>{title_clean}</title></head><body>
<div class="news_headline"><h4 class="title">{title_clean}</h4>
<div class="info"><span>{date_str}</span></div></div>
<div class="news_end">{body_html}</div>
</body></html>"""
    else:  # card: content div present, captions are noise-stripped
        shape = "card"
        html = f"""<html><head><title>{title_clean}</title></head><body>
<h2 class="end_tit">{title_clean}</h2>
<article><div class="end_ct_area">{body_html}</div></article>
</body></html>"""

    encoding = "euc-kr" if rng.random() < 0.1 else "utf-8"
    try:
        raw = html.encode(encoding)
    except UnicodeEncodeError:
        encoding = "utf-8"
        raw = html.encode("utf-8")
    return {
        "url": url, "warc_ts": warc_ts, "html": raw,
        "text": expected_content, "lang": lang,
        "title": sanitize_text(title_clean), "shape": shape,
    }


def make_pages_pdf(start: int, end: int) -> pd.DataFrame:
    """Pages rows [start, end) as a pandas DataFrame."""
    rows = [make_page(i) for i in range(start, end)]
    pdf = pd.DataFrame(rows)
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"])
    return pdf


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "title string, shape string"
)


def pages_df(spark, n_docs: int, partitions: int = 32):
    """Distributed deterministic pages DataFrame (pure function of range)."""

    def gen(iterator):
        import pandas as pd

        for pdf in iterator:
            ids = pdf["id"].tolist()
            if not ids:
                continue
            # one DataFrame per incoming Arrow batch, not per row — the
            # rows are per-id seeded, so batching changes no bytes.
            # spark.range partitions are contiguous slices, so the whole
            # batch is one make_pages_pdf range call
            if ids == list(range(ids[0], ids[-1] + 1)):
                yield make_pages_pdf(ids[0], ids[-1] + 1)
            else:  # defensive: non-contiguous input ids
                yield pd.concat(
                    [make_pages_pdf(i, i + 1) for i in ids],
                    ignore_index=True,
                )

    return (
        spark.range(0, n_docs, 1, partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def make_query_set() -> list[dict]:
    """The fixed reference query set (FIXTURES.md §2): head/torso/tail terms,
    a zero-hit term, and multi-term phrases, k=10."""
    queries = [
        VOCAB[0],                      # head: in nearly every doc
        VOCAB[10],                     # upper torso
        VOCAB[100],                    # torso
        VOCAB[1000],                   # tail
        VOCAB[4500],                   # deep tail
        f"{VOCAB[5]} {VOCAB[50]}",     # two-term
        f"{VOCAB[3]} {VOCAB[300]} {VOCAB[2000]}",  # three-term mixed
        # zero-hit: analyzes to ONE token absent from every analyzed
        # doc (the old text segmented to '단어', which decompounds
        # out of tail vocab words like '단어부' — NOT zero-hit)
        "없는용어찾기테스트",
        f"{VOCAB[0]} {VOCAB[1]}",      # two head terms
        f"{VOCAB[20]} nonexistenttermxyz",  # one real + one zero-hit
    ]
    return [
        {"query_id": qid, "query_text": q, "k": 10}
        for qid, q in enumerate(queries)
    ]


# -- deterministic Korean NEWS-style corpus (ontology extraction input) ------
# The pages corpus above is Zipf syllable soup (built for BM25/indexing);
# the ontology rule patterns (operators/ontology.py, mirroring
# /root/reference/src/ontology/extractor.rs:896-1056) need press-style
# sentences. Vocabulary chosen to EXERCISE the pattern tables; composition
# is index-deterministic (no RNG) so every run yields identical triples.
_ONT_NAMES = ("김수종", "박민재", "이서연", "정하늘", "최은우", "한지민",
              "윤도현", "강태오")
_ONT_ORGS = ("한빛전자", "미래그룹", "두리은행", "새봄증권", "크래프트테크",
             "한솔건설")
_ONT_PARTIES = ("국민의힘", "더불어민주당", "정의당", "진보당")
_ONT_MINISTRIES = ("기획재정부", "외교부", "국방부", "환경부")
# each template triggers a specific relation pattern AND keeps its
# subject/object entity-validatable (extractor.rs:1714-1733); 14 of the
# 16 relation types are reachable — Founded/RelatedTo cannot pass the
# reference's own validation rules from press-style sentences
_ONT_SENTENCES = (
    "{name} 씨가 현장을 찾았다.",
    "{name} {org} 사장이 신제품 출시 계획을 밝혔다.",       # WorksFor
    "{org} {name2} 부사장이 실적을 공개했다.",              # WorksFor (swap)
    "{party} {name} 의원이 기자회견을 열었다.",             # MemberOf
    "{name} {ministry} 장관이 회의를 주재했다.",            # Leads
    "윤도현 대통령은 순방길에 올랐다.",                     # Leads
    "{name} 미래그룹 회장이 인사를 단행했다.",              # Leads
    "{party}은 {ministry}를 비판했다.",                     # Criticized
    "더불어민주당은 {ministry}에 반대했다.",                # Opposed
    "야당은 {ministry}을 지지했다.",                        # Supported
    "정부가 부동산대책을 발표했다.",                        # Announced
    "{org}이 {org2}를 인수했다.",                           # Acquired
    "{org}은 {org2}와 합병하기로 했다.",                    # MergedWith
    '{name} 대표는 "{org} 제품 수요가 빠르게 늘고 있다"라고 말했다.',  # Said
    "서울 강남구에서 협약식이 열렸다.",                     # LocatedIn
    "{org}이 {org2}에 1,200억 원을 투자했다.",              # InvestedIn
    "한국이 미국과 협력하기로 했다.",                       # Supported
    "미국이 {ministry}협의에 참여했다.",                    # ParticipatedIn
    "미래그룹 계열사인 한빛전자가 지지율을 35.2% 끌어올렸다.",  # Owns
)


def ontology_docs(spark, n_docs: int, partitions: int = 8):
    """(doc_id, title, text) of deterministic Korean press-style articles;
    doc i's sentences are index-rotations of the template bank, so the
    extracted triple set is a pure function of n_docs."""
    import pandas as pd

    def render(i: int, j: int) -> str:
        t = _ONT_SENTENCES[(i + j) % len(_ONT_SENTENCES)]
        return t.format(
            name=_ONT_NAMES[(i + j) % len(_ONT_NAMES)],
            name2=_ONT_NAMES[(i + j + 1) % len(_ONT_NAMES)],
            org=_ONT_ORGS[(i + j) % len(_ONT_ORGS)],
            org2=_ONT_ORGS[(i + j + 1) % len(_ONT_ORGS)],
            party=_ONT_PARTIES[(i + j) % len(_ONT_PARTIES)],
            ministry=_ONT_MINISTRIES[(i + j) % len(_ONT_MINISTRIES)],
        )

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].tolist()
            yield pd.DataFrame({
                "doc_id": ids,
                "title": [render(i, 0) for i in ids],
                "text": [" ".join(render(i, j) for j in range(1, 6))
                         for i in ids],
            })

    return spark.range(0, n_docs, 1, partitions).mapInPandas(
        gen, schema="doc_id long, title string, text string"
    )


def make_query_set_extended() -> list[dict]:
    """The hardened rank-identity query set (>=25): the committed 10 plus
    decompound-bait compounds, tie clusters over duplicated content,
    repeated/many-term phrases, ASCII+Korean mixes, punctuation, and
    multi-OOV — every query asserted rank- AND score-identical across
    WAND / exhaustive / brute force and across a compaction
    (tests/test_index_search.py)."""
    extra = [
        # compounds of vocab words — decompound/segmenter bait: both the
        # engine and the oracle analyze identically, so identity holds
        # whatever the segmentation does
        (f"{VOCAB[0]}{VOCAB[1]}", 10),
        (f"{VOCAB[7]}{VOCAB[700]}", 10),
        (f"{VOCAB[2]}{VOCAB[2]}", 10),
        # repeated terms count once (Q dedup)
        (f"{VOCAB[2]} {VOCAB[2]} {VOCAB[2]}", 10),
        # wide unions: 4- and 5-term mixed-frequency phrases
        (" ".join(VOCAB[i] for i in (1, 11, 111, 1111)), 10),
        (" ".join(VOCAB[i] for i in (4, 40, 400, 4000, 4999)), 10),
        # head-heavy tie clusters (the ~3% duplicated pages produce
        # exact score ties — doc_id asc must break them identically)
        (VOCAB[1], 50),
        (f"{VOCAB[0]} {VOCAB[2]}", 50),
        # ASCII vocab terms (lowercase/normalization path)
        (VOCAB[3], 10),       # search12
        (VOCAB[8], 10),       # shard70
        (f"{VOCAB[3]} {VOCAB[19]}", 10),
        # ASCII + Korean mixed phrase
        (f"{VOCAB[0]} {VOCAB[5]}", 10),
        (f"{VOCAB[9]} {VOCAB[100]} {VOCAB[2000]}", 10),
        # punctuation / quoting the search analyzer must strip
        (f"{VOCAB[6]}.", 10),
        (f"'{VOCAB[12]}'", 10),
        (f"{VOCAB[13]}, {VOCAB[130]}!", 10),
        # OOV-only and mixed-OOV
        ("xyzzyqq plugh999", 10),
        (f"{VOCAB[15]} 존재하지않는용어 {VOCAB[1500]}", 10),
        # deep-tail singletons at small and large k
        (VOCAB[4700], 3),
        (VOCAB[3500], 50),
    ]
    qs = make_query_set()
    qs += [
        {"query_id": len(qs) + i, "query_text": t, "k": k}
        for i, (t, k) in enumerate(extra)
    ]
    return qs
