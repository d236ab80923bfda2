"""Entity linking — the ontology linker analog
(/root/reference/src/ontology/linker.rs, 1,728 LoC).

Re-implements the reference's ``EntityLinker``: text normalization
(title-suffix stripping for persons, quote trimming, whitespace
collapse — linker.rs:677-714), the built-in Korean knowledge base with
Wikidata/DBpedia ids (linker.rs:321-561, mirrored verbatim — the data
table IS the spec), alias lookup, containment/char-Jaccard fuzzy match
with the 0.8 default threshold (linker.rs:716-769), and the
``LinkedEntity`` output incl. RDF URIs (linker.rs:141-214).

Spark shape: one Arrow-batched ``mapInPandas`` pass (the KB is a small
broadcast-by-closure constant), composing with
:mod:`baram_spark.operators.ontology`'s entity extraction.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

# -- default knowledge base (linker.rs:321-561, verbatim) --------------------
# entries: canonical -> (entity_type, aliases, external_ids)
DEFAULT_KB: dict[str, tuple[str, list[str], dict[str, str]]] = {
    "윤석열": ("Person", ["윤석열 대통령", "윤 대통령"],
              {"wikidata": "Q57549003", "dbpedia": "Yoon_Suk-yeol"}),
    "이재명": ("Person", ["이재명 대표", "이 대표"],
              {"wikidata": "Q6512891", "dbpedia": "Lee_Jae-myung"}),
    "한동훈": ("Person", ["한동훈 대표", "한 대표"],
              {"wikidata": "Q107192814"}),
    "이재용": ("Person", ["이재용 회장", "이 회장", "Jay Y. Lee"],
              {"wikidata": "Q491522",
               "dbpedia": "Lee_Jae-yong_(businessman)"}),
    "삼성전자": ("Organization", ["삼성", "Samsung", "Samsung Electronics"],
               {"wikidata": "Q20718", "dbpedia": "Samsung_Electronics",
                "stock": "005930"}),
    "SK하이닉스": ("Organization", ["하이닉스", "SK Hynix"],
                {"wikidata": "Q487653", "dbpedia": "SK_Hynix",
                 "stock": "000660"}),
    "현대자동차": ("Organization", ["현대차", "Hyundai", "현대"],
                {"wikidata": "Q55931",
                 "dbpedia": "Hyundai_Motor_Company", "stock": "005380"}),
    "LG전자": ("Organization", ["LG", "LG Electronics"],
              {"wikidata": "Q216047", "dbpedia": "LG_Electronics",
               "stock": "066570"}),
    "국민의힘": ("Organization", ["국힘", "여당", "PPP"],
               {"wikidata": "Q96165405",
                "dbpedia": "People_Power_Party_(South_Korea)"}),
    "더불어민주당": ("Organization", ["민주당", "더민주", "야당", "DPK"],
                 {"wikidata": "Q21207862",
                  "dbpedia": "Democratic_Party_of_Korea"}),
    "기획재정부": ("Organization", ["기재부", "MOEF"],
                {"wikidata": "Q483867"}),
    "대한민국": ("Location", ["한국", "South Korea", "Korea"],
               {"wikidata": "Q884", "dbpedia": "South_Korea", "iso": "KR"}),
    "서울": ("Location", ["서울시", "서울특별시", "Seoul"],
            {"wikidata": "Q8684", "dbpedia": "Seoul"}),
    "미국": ("Location", ["미합중국", "United States", "USA", "US"],
            {"wikidata": "Q30", "dbpedia": "United_States", "iso": "US"}),
    "중국": ("Location", ["중화인민공화국", "China", "PRC"],
            {"wikidata": "Q148", "dbpedia": "China", "iso": "CN"}),
    "일본": ("Location", ["Japan"],
            {"wikidata": "Q17", "dbpedia": "Japan", "iso": "JP"}),
}

# alias (lowercased) -> canonical, canonical itself included
# (linker.rs:564-578)
ALIAS_MAP: dict[str, str] = {}
for _canon, (_t, _aliases, _ids) in DEFAULT_KB.items():
    for _a in _aliases:
        ALIAS_MAP[_a.lower()] = _canon
    ALIAS_MAP[_canon.lower()] = _canon

# linker.rs:270-305
TITLE_SUFFIXES = (
    "씨", "님", "대표", "회장", "사장", "원장", "총장", "장관", "의원",
    "대통령", "총리", "교수", "박사", "기자", "작가", "배우", "감독",
    "선수", "코치", "위원", "위원장", "본부장", "실장", "팀장", "부장",
)

SIMILARITY_THRESHOLD = 0.8  # LinkerConfig default (linker.rs:119)
BASE_URI = "https://baram.example.org/entity/"


def url_encode(s: str) -> str:
    """linker.rs:199-214: keep ascii-alnum and ``-_.~``, space → ``_``,
    everything else percent-encoded byte by byte."""
    out = []
    for c in s:
        if c.isascii() and (c.isalnum() or c in "-_.~"):
            out.append(c)
        elif c == " ":
            out.append("_")
        else:
            out.append("".join(f"%{b:02X}" for b in c.encode("utf-8")))
    return "".join(out)


def normalize_text(text: str, entity_type: str) -> str:
    """linker.rs:677-714: strip person title suffixes (repeatedly, also
    with a leading space), trim straight/curly quotes, collapse
    whitespace."""
    normalized = text.strip()
    if entity_type == "Person":
        for suffix in TITLE_SUFFIXES:
            while normalized.endswith(suffix):
                normalized = normalized[: -len(suffix)].strip()
            with_space = f" {suffix}"
            while normalized.endswith(with_space):
                normalized = normalized[: -len(with_space)].strip()
    normalized = normalized.strip("'\"“”")
    return " ".join(normalized.split())


def similarity(a: str, b: str) -> float:
    """linker.rs:740-769: exact → 1.0; containment → byte-length ratio
    (Rust ``len()`` counts bytes); else char-level Jaccard."""
    if a == b:
        return 1.0
    if not a or not b:
        return 0.0
    if b in a or a in b:
        la, lb = len(a.encode("utf-8")), len(b.encode("utf-8"))
        return min(la, lb) / max(la, lb)
    ca, cb = set(a), set(b)
    union = len(ca | cb)
    return len(ca & cb) / union if union else 0.0


def _fuzzy_match(text_lower: str) -> tuple[str, float] | None:
    """Best KB candidate over canonicals AND aliases (linker.rs:716-738)."""
    best: tuple[str, float] | None = None
    for canonical, (_t, aliases, _ids) in DEFAULT_KB.items():
        s = similarity(text_lower, canonical.lower())
        if s > (best[1] if best else 0.0):
            best = (canonical, s)
        for alias in aliases:
            s = similarity(text_lower, alias.lower())
            if s > (best[1] if best else 0.0):
                best = (canonical, s)
    return best


def link_one(text: str, entity_type: str, confidence: float = 0.8,
             threshold: float = SIMILARITY_THRESHOLD,
             fuzzy: bool = True, _cache: dict | None = None) -> dict:
    """``EntityLinker::link`` (linker.rs:581-675): alias lookup → fuzzy
    match ≥ threshold → normalized fallback with a baram entity URI."""
    key = f"{text}:{entity_type}"
    if _cache is not None and key in _cache:
        return _cache[key]
    normalized = normalize_text(text, entity_type)

    hit = ALIAS_MAP.get(normalized.lower())
    conf = 0.95
    if hit is None and fuzzy:
        m = _fuzzy_match(normalized.lower())
        if m is not None and m[1] >= threshold:
            hit, conf = m[0], m[1]
    if hit is not None:
        etype, aliases, ids = DEFAULT_KB[hit]
        out = {
            "original": text,
            "canonical": hit,
            "entity_type": etype,  # the KB's type wins on a hit
            "wikidata": ids.get("wikidata"),
            "dbpedia": ids.get("dbpedia"),
            "confidence": float(conf),
            "rdf_uri": (
                f"http://www.wikidata.org/entity/{ids['wikidata']}"
                if "wikidata" in ids else None
            ),
            "in_knowledge_base": True,
        }
    else:
        out = {
            "original": text,
            "canonical": normalized,
            "entity_type": entity_type,
            "wikidata": None,
            "dbpedia": None,
            "confidence": float(confidence),
            "rdf_uri": f"{BASE_URI}{url_encode(normalized)}",
            "in_knowledge_base": False,
        }
    if _cache is not None:
        _cache[key] = out
    return out


LINKED_SCHEMA = (
    "doc_id string, original string, canonical string, entity_type string, "
    "wikidata string, dbpedia string, confidence double, rdf_uri string, "
    "in_knowledge_base boolean"
)


def link_entities(
    docs: DataFrame,
    id_col: str = "doc_id",
    title_col: str = "title",
    text_col: str = "text",
    threshold: float = SIMILARITY_THRESHOLD,
    fuzzy: bool = True,
) -> DataFrame:
    """Extract entities per doc (the ontology rule tables) and link each
    to its canonical KB form — one narrow Arrow-batched pass, no shuffle.
    Downstream aggregations (mentions per canonical entity, the stats.rs
    analog) are plain codegen group-bys."""
    from .ontology import extract_entities

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split()[0] for c in LINKED_SCHEMA.split(", ")]
        for pdf in batches:
            rows: list[dict] = []
            cache: dict = {}
            for rid, title, text in zip(pdf[id_col], pdf[title_col],
                                        pdf[text_col]):
                full = f"{title or ''}\n{text or ''}"
                for e in extract_entities(full, "content"):
                    linked = link_one(
                        e["text"], e["entity_type"], e["confidence"],
                        threshold=threshold, fuzzy=fuzzy, _cache=cache,
                    )
                    rows.append({"doc_id": str(rid), **linked})
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, title_col, text_col).mapInPandas(
        run, schema=LINKED_SCHEMA
    )
