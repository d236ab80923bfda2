"""Rule-based ontology triple extraction — the Spark analog of the
reference's ontology subsystem (/root/reference/src/ontology/, 6,943 LoC).

Re-implements the RULE path of ``RelationExtractor``
(extractor.rs:1526-1857): regex entity extraction (person / organization /
location / money / percentage), sentence-scoped relation patterns with
the MemberOf/WorksFor subject-object swap, entity-validation, the
hallucination-verifier confidence fold (×1.2 verified / ×0.7 not,
extractor.rs:1782-1808), the confidence-threshold filter, and
``Triple::from_relation`` (extractor.rs:1284-1308: baram:entity ids via
``slug``, schema.org predicates, Korean predicate labels).

The LLM path (extractor.rs PromptTemplate + LlmEntityResponse) is an
external-model swap point, same policy as A6 embeddings: callers can pass
``relation_fn`` to replace the rule extractor per batch.

Spark shape: one Arrow-batched ``mapInPandas`` pass over the docs
relation — narrow, shuffle-free; the aggregation queries downstream
(triples per predicate, top entities) are plain codegen group-bys.

One deliberate divergence: the reference iterates RELATION_PATTERNS out
of a HashMap (nondeterministic order across runs); here the pattern table
is an ordered list so output is deterministic under the same truncation
limits.

Pattern tables below mirror extractor.rs:896-1056 verbatim — the data
tables ARE the spec, like the analyzer stoptags.
"""
from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

# -- entity type → RDF type (extractor.rs:706-721) ---------------------------
RDF_TYPE = {
    "Person": "schema:Person",
    "Organization": "schema:Organization",
    "Location": "schema:Place",
    "DateTime": "schema:DateTime",
    "Money": "schema:MonetaryAmount",
    "Percentage": "schema:QuantitativeValue",
    "Event": "schema:Event",
    "Product": "schema:Product",
    "Policy": "schema:GovernmentService",
    "Other": "schema:Thing",
}

# -- relation type → (rdf predicate, korean label) (extractor.rs:818-863) ----
RELATION_META = {
    "WorksFor": ("schema:worksFor", "근무"),
    "MemberOf": ("schema:memberOf", "소속"),
    "Leads": ("schema:founder", "대표"),
    "LocatedIn": ("schema:location", "위치"),
    "Owns": ("schema:owns", "소유"),
    "Founded": ("schema:founder", "설립"),
    "Said": ("schema:author", "발언"),
    "ParticipatedIn": ("schema:participant", "참여"),
    "Announced": ("schema:publicationDate", "발표"),
    "Criticized": ("baram:criticized", "비판"),
    "Supported": ("baram:supported", "지지"),
    "Opposed": ("baram:opposed", "반대"),
    "InvestedIn": ("schema:investor", "투자"),
    "Acquired": ("schema:acquiredFrom", "인수"),
    "MergedWith": ("baram:mergedWith", "합병"),
    "RelatedTo": ("schema:relatedTo", "관련"),
    "Unknown": ("baram:unknown", "미상"),
}

# -- entity patterns (extractor.rs:896-938) ----------------------------------
_TITLES = (
    "대표|장관|의원|대통령|총리|사장|회장|원장|교수|박사|기자|작가|배우|감독|"
    "위원장|총재|검사|판사|변호사|국장|실장|수석|비서관|최고위원|사무총장|"
    "대변인|정책위의장|원내대표|당대표|비대위원장"
)
_PARTIES = (
    "국민의힘|더불어민주당|민주당|조국혁신당|개혁신당|정의당|진보당|새로운미래"
)
PERSON_PATTERNS = [
    re.compile(r"([가-힣]{2,4})\s*(" + _TITLES + r")"),
    re.compile(r"['\"]([가-힣]{2,4})['\"]"),
    re.compile(r"([가-힣]{2,4})\s*(씨|님)"),
    re.compile(
        r"([가-힣]{2,4})[은는이가]\s*(?:말했다|밝혔다|전했다|설명했다|강조했다|"
        r"주장했다|언급했다|덧붙였다|지적했다|발표했다)"
    ),
    re.compile(
        r"([가-힣]{2,4})\s+(?:대표|장관|의원|대통령|총리|사장|회장|원장|최고위원|"
        r"사무총장|대변인|정책위의장|원내대표)[이가은는]"
    ),
    re.compile(
        r"(?:" + _PARTIES + r")\s+([가-힣]{2,4})\s*"
        r"(?:의원|대표|원내대표|비대위원장|당대표|최고위원|사무총장|대변인|정책위의장)"
    ),
]
ORG_PATTERNS = [
    re.compile(
        r"([가-힣A-Za-z]+)(전자|그룹|은행|증권|보험|건설|제약|바이오|엔터|통신|"
        r"뱅크|캐피탈|투자|자산운용|펀드|벤처스|테크|소프트)"
    ),
    re.compile(r"([가-힣]+)(부|처|청|원|위원회|공사|공단)"),
    re.compile(r"(" + _PARTIES + r"|국민의당|무소속)"),
    re.compile(
        r"(정부|청와대|대통령실|국회|여당|야당|행정부|사법부|입법부|헌법재판소|"
        r"대법원|검찰|경찰)"
    ),
    re.compile(
        r"(오픈AI|OpenAI|마이크로소프트|MS|구글|애플|아마존|메타|테슬라|"
        r"엔비디아|네이버|카카오)"
    ),
]
LOCATION_PATTERNS = [
    re.compile(
        r"(서울|부산|대구|인천|광주|대전|울산|세종|경기|강원|충북|충남|전북|"
        r"전남|경북|경남|제주)(시|도|특별시|광역시)?"
    ),
    re.compile(r"([가-힣]+)(구|군|읍|면|동)"),
    re.compile(r"(미국|중국|일본|러시아|북한|영국|프랑스|독일|호주|캐나다|인도)"),
]
MONEY_PATTERN = re.compile(r"(\d+(?:,\d{3})*(?:\.\d+)?)\s*(원|달러|위안|엔|유로|억|조)")
PCT_PATTERN = re.compile(r"(\d+(?:\.\d+)?)\s*(%|퍼센트|프로)")

# -- relation patterns (extractor.rs:940-1053), ORDERED ----------------------
_ORG_SUFFIX = (
    "전자|그룹|물산|건설|은행|증권|보험|생명|화학|중공업|에너지|제약|바이오"
)
RELATION_PATTERNS: list[tuple[str, list[re.Pattern]]] = [
    ("WorksFor", [
        re.compile(
            r"([가-힣]{2,4})\s+([가-힣A-Za-z]+(?:" + _ORG_SUFFIX + r"))\s*"
            r"(?:회장|사장|대표|부회장|부사장|전무|상무|이사|대표이사)"
        ),
        re.compile(
            r"([가-힣A-Za-z]+(?:" + _ORG_SUFFIX + r"))\s+([가-힣]{2,4})\s*"
            r"(?:회장|사장|대표|부회장|부사장|전무|상무|이사|대표이사)"
        ),
    ]),
    ("MemberOf", [
        re.compile(
            r"([가-힣]{2,4})\s+(" + _PARTIES + r")\s*"
            r"(?:의원|대표|원내대표|비대위원장|당대표|최고위원|사무총장|대변인|정책위의장)"
        ),
        re.compile(
            r"(" + _PARTIES + r")\s+([가-힣]{2,4})\s*"
            r"(?:의원|대표|원내대표|비대위원장|당대표|최고위원|사무총장|대변인|정책위의장)"
        ),
    ]),
    ("Leads", [
        re.compile(
            r"([가-힣]{3})\s+(대통령|국무총리|대법원장|헌법재판소장|국회의장|"
            r"감사원장)[은는이가을를의]"
        ),
        re.compile(r"([가-힣]{2,4})\s+([가-힣]+부)\s*장관"),
        re.compile(
            r"([가-힣]{2,4})\s+([가-힣A-Za-z]+(?:그룹|재단|협회|연구원|공사|공단))\s*"
            r"(회장|총재|이사장|원장|사장)"
        ),
        re.compile(r"(김정은|김여정|김정일)\s+(국무위원장|노동당\s*총비서|당\s*중앙군사위원장)"),
        re.compile(r"(트럼프|바이든|시진핑|푸틴|기시다|마크롱|숄츠)\s+(대통령|총리|주석|총서기)"),
    ]),
    ("LocatedIn", [
        re.compile(
            r"(서울|부산|인천|대구|대전|광주|울산|세종)(?:시|특별시|광역시)?\s+"
            r"([가-힣]{1,3}구)"
        ),
        re.compile(r"(경기|강원|충북|충남|전북|전남|경북|경남)(?:도)?\s+([가-힣]{2,4}시)"),
    ]),
    ("Founded", [
        re.compile(r"([가-힣]{2,4})[이가은는]\s+([가-힣A-Za-z]+)[을를]\s*(?:설립|창립|창업|창설)"),
        re.compile(r"([가-힣]{2,4})\s+([가-힣A-Za-z]+)\s*(?:창업자|설립자|창업주)"),
    ]),
    ("ParticipatedIn", [
        re.compile(
            r"([가-힣]{2,4})\s+(?:대통령|총리|장관|수석)?[이가은는]?\s+"
            r"([가-힣A-Za-z]+(?:정상회담|회담|회의|포럼|총회|간담회|행사))에\s*"
            r"(?:참석|참여|참가)"
        ),
        re.compile(
            r"(한국|미국|중국|일본|러시아|북한|영국|프랑스|독일)[이가은는]\s+"
            r"([가-힣A-Za-z0-9]+(?:회담|협상|협의|회의))에\s*(?:참여|참가|참석)"
        ),
    ]),
    ("Announced", [
        re.compile(
            r"(정부|청와대|대통령실|국회|[가-힣]+부|[가-힣]+위원회|한국은행)"
            r"[이가은는]\s+([가-힣]+(?:안|대책|방안|계획|정책))[을를]\s*"
            r"(?:발표|공개|공표|발의)"
        ),
    ]),
    ("Criticized", [
        re.compile(
            r"(여당|야당|국민의힘|더불어민주당|민주당|조국혁신당|진보당)[이가은는]\s+"
            r"([가-힣]+)[을를에]\s*(?:비판|비난|질타|규탄|공격|맹비난)"
        ),
        re.compile(
            r"([가-힣]{2,4})\s+(?:의원|대표|위원장)?[이가은는]\s+([가-힣]+)[을를에]\s*"
            r"(?:비판|비난|질타|규탄|공격)"
        ),
    ]),
    ("Supported", [
        re.compile(
            r"(여당|야당|국민의힘|더불어민주당|민주당)[이가은는]\s+"
            r"([가-힣A-Za-z]+)[을를에]\s*(?:지지|찬성|옹호|환영|동의)"
        ),
        re.compile(
            r"(한국|미국|중국|일본|러시아|영국|프랑스|독일)[이가은는]\s+"
            r"(한국|미국|중국|일본|러시아|영국|프랑스|독일)[와과]\s*"
            r"(?:협력|연대|공조|합의|동맹)"
        ),
    ]),
    ("Opposed", [
        re.compile(
            r"(여당|야당|국민의힘|더불어민주당|민주당|조국혁신당)[이가은는]\s+"
            r"([가-힣A-Za-z]+(?:안|법|법안)?)[을를에]\s*"
            r"(?:반대|저지|거부|불참|퇴장|보이콧)"
        ),
    ]),
    ("InvestedIn", [
        re.compile(
            r"([가-힣A-Za-z]+(?:전자|그룹|증권|캐피탈|벤처스|뱅크|은행|투자|"
            r"자산운용|펀드))[이가은는]\s+([가-힣A-Za-z]+)에\s*"
            r"(?:[0-9,]+\s*(?:억|조)\s*(?:원|달러)?)?[을를]?\s*(?:투자|출자)"
        ),
        re.compile(
            r"(정부|[가-힣]+부)[이가은는]\s+([가-힣A-Za-z]+)에\s*"
            r"(?:[0-9,]+\s*(?:억|조)\s*원)?[을를]?\s*(?:투자|출자|지원)"
        ),
        re.compile(
            r"([가-힣A-Za-z]{2,10})[이가은는]\s+(?:[가-힣A-Za-z\s]+\s+)?"
            r"([가-힣A-Za-z]{2,15})에\s+(?:[0-9,]+\s*(?:억|조)\s*(?:원|달러))?"
            r"[을를]?\s*투자"
        ),
        re.compile(
            r"([가-힣A-Za-z]{2,15})[이가은는]\s+(?:.{0,20})?([가-힣A-Za-z]{2,15})에\s+"
            r"(?:[0-9,]+\s*(?:억|조)\s*(?:원|달러)[^\s]*\s*)?(?:를\s*)?"
            r"투자(?:했다|한다|하겠다|하기로|할)"
        ),
    ]),
    ("Acquired", [
        re.compile(
            r"([가-힣A-Za-z]+(?:전자|그룹|건설|은행|증권|뱅크|투자))[이가은는]\s+"
            r"([가-힣A-Za-z]+)[을를]\s*(?:인수|매입|매수|인수합병)"
        ),
        re.compile(
            r"([가-힣A-Za-z]{2,10})[이가은는]\s+([가-힣A-Za-z]{2,15})[을를]\s+"
            r"(?:[0-9,]+\s*(?:억|조)\s*(?:원|달러)\s*(?:규모|에)?)?인수"
        ),
    ]),
    ("MergedWith", [
        re.compile(
            r"([가-힣A-Za-z]+(?:전자|물산|건설|은행|증권|보험))[이가은는]\s+"
            r"([가-힣A-Za-z]+(?:전자|물산|건설|은행|증권|보험))[와과]\s*(?:합병|통합)"
        ),
    ]),
    ("Owns", [
        re.compile(
            r"([가-힣A-Za-z]+그룹)\s*(?:계열사|자회사|계열|산하)[인은의]?\s+"
            r"([가-힣A-Za-z]+(?:전자|물산|건설|생명|화재|증권|카드|SDI|SDS|엔지니어링))"
        ),
    ]),
    ("Said", [
        re.compile(
            r"([가-힣]{2,4})\s*(?:회장|사장|대표|의원|장관|총리|대통령|CEO|대변인|"
            r"관계자)[은는이가]\s+[\"']?(.{10,50})[\"']?(?:라고|이라고)\s*"
            r"(?:말했다|밝혔다|전했다|강조했다|설명했다)"
        ),
        re.compile(
            r"[\"'](.{10,50})[\"'](?:라고|이라고)\s+([가-힣]{2,4})\s*"
            r"(?:회장|사장|대표|의원|장관)[이가]\s*(?:말했다|밝혔다|전했다)"
        ),
    ]),
]

_MEMBER_PARTIES = set(_PARTIES.split("|"))
_WORKSFOR_SUFFIXES = tuple(_ORG_SUFFIX.split("|"))

# confidence constants (extractor.rs:1543-1625, 1750, 1799-1804)
_ENTITY_CONF = {"Person": 0.8, "Organization": 0.85, "Location": 0.9,
                "Money": 0.95, "Percentage": 0.95}
_RELATION_CONF = 0.8
_VERIFY_BOOST, _VERIFY_PENALTY = 1.2, 0.7


def slug(text: str) -> str:
    """extractor.rs:1475-1486: non-alphanumeric (except - _) → '_',
    lowercased."""
    return "".join(
        c if (c.isalnum() or c in "-_") else "_" for c in text
    ).lower()


def extract_entities(text: str, source: str,
                     min_entity_length: int = 2,
                     max_entities: int = 50) -> list[dict]:
    """Rule entity pass (extractor.rs:1526-1635): ordered pattern tables,
    first-seen text wins, per-type confidences, truncation."""
    entities: list[dict] = []
    seen: set[str] = set()

    def emit(name, etype, start, end, conf):
        if name not in seen:
            seen.add(name)
            entities.append({
                "text": name, "entity_type": etype, "start": start,
                "end": end, "confidence": conf, "source": source,
            })

    for pat in PERSON_PATTERNS:
        for m in pat.finditer(text):
            name = m.group(1)
            if len(name) >= min_entity_length:
                emit(name, "Person", m.start(1), m.end(1),
                     _ENTITY_CONF["Person"])
    for pat in ORG_PATTERNS:
        for m in pat.finditer(text):
            name = m.group(0)
            if len(name) >= min_entity_length:
                emit(name, "Organization", m.start(0), m.end(0),
                     _ENTITY_CONF["Organization"])
    for pat in LOCATION_PATTERNS:
        for m in pat.finditer(text):
            name = m.group(0)
            if len(name) >= min_entity_length:
                emit(name, "Location", m.start(0), m.end(0),
                     _ENTITY_CONF["Location"])
    for m in MONEY_PATTERN.finditer(text):
        emit(m.group(0), "Money", m.start(0), m.end(0),
             _ENTITY_CONF["Money"])
    for m in PCT_PATTERN.finditer(text):
        emit(m.group(0), "Percentage", m.start(0), m.end(0),
             _ENTITY_CONF["Percentage"])
    return entities[:max_entities]


def _is_korean_name(s: str) -> bool:
    return 2 <= len(s) <= 4 and all("가" <= c <= "힣" for c in s)


def extract_relations(text: str, entities: list[dict],
                      max_relations: int = 100) -> list[dict]:
    """Sentence-scoped relation pass (extractor.rs:1637-1779): first match
    per pattern per sentence, MemberOf/WorksFor ORG-NAME swap,
    entity-validation by bidirectional substring, subject/object types
    from the first CONTAINING entity."""
    relations: list[dict] = []
    sentences = [s for s in re.split(r"[.。!?]", text) if s.strip()]
    entity_texts = {e["text"] for e in entities}

    for sentence in sentences:
        for rtype, pats in RELATION_PATTERNS:
            for pat in pats:
                m = pat.search(sentence)
                if m is None or pat.groups < 1:
                    continue
                subject = m.group(1) or ""
                obj = (m.group(2) or "") if pat.groups >= 2 else ""
                if rtype == "MemberOf":
                    if subject in _MEMBER_PARTIES and _is_korean_name(obj):
                        subject, obj = obj, subject
                elif rtype == "WorksFor":
                    if subject.endswith(_WORKSFOR_SUFFIXES) and \
                            _is_korean_name(obj):
                        subject, obj = obj, subject
                subject_valid = subject in entity_texts or any(
                    subject in e["text"] or e["text"] in subject
                    for e in entities
                )
                object_valid = (not obj) or obj in entity_texts or any(
                    obj in e["text"] or e["text"] in obj for e in entities
                )
                if subject and subject_valid and object_valid:
                    stype = next(
                        (e["entity_type"] for e in entities
                         if subject in e["text"]), "Other")
                    otype = next(
                        (e["entity_type"] for e in entities
                         if obj in e["text"]), "Other")
                    relations.append({
                        "subject": subject, "subject_type": stype,
                        "predicate": rtype, "object": obj,
                        "object_type": otype,
                        "confidence": _RELATION_CONF,
                        "evidence": sentence.strip(), "verified": False,
                    })
    return relations[:max_relations]


def verify_relation(rel: dict, text: str) -> dict:
    """Hallucination check (extractor.rs:1782-1808): subject, object and
    evidence must all appear in the source text; the confidence folds
    ×1.2 (capped 1.0) when verified, ×0.7 when not."""
    found = (
        rel["subject"] in text
        and (not rel["object"] or rel["object"] in text)
        and (not rel["evidence"] or rel["evidence"] in text
             or rel["evidence"].strip() in text)
    )
    rel = dict(rel)
    rel["verified"] = found
    rel["confidence"] = (
        min(rel["confidence"] * _VERIFY_BOOST, 1.0) if found
        else rel["confidence"] * _VERIFY_PENALTY
    )
    return rel


def extract_from_article(title: str, content: str, article_id: str,
                         min_entity_length: int = 2,
                         max_entities: int = 50,
                         max_relations: int = 100,
                         confidence_threshold: float = 0.3) -> list[dict]:
    """``extract_from_article`` (extractor.rs:1810-1836) → Triple rows
    (``Triple::from_relation``, extractor.rs:1284-1308)."""
    ents = extract_entities(title or "", "title",
                            min_entity_length, max_entities)
    ents += extract_entities(content or "", "content",
                             min_entity_length, max_entities)
    # dedupe by lowercase text: max confidence, source merge → "both"
    merged: dict[str, dict] = {}
    for e in ents:
        key = e["text"].lower()
        if key in merged:
            prev = merged[key]
            if e["confidence"] > prev["confidence"]:
                prev["confidence"] = e["confidence"]
            if e["source"] != prev["source"]:
                prev["source"] = "both"
        else:
            merged[key] = dict(e)
    entities = list(merged.values())

    full_text = f"{title}\n{content}"
    rels = extract_relations(full_text, entities, max_relations)
    rels = [verify_relation(r, full_text) for r in rels]
    rels = [r for r in rels if r["confidence"] >= confidence_threshold]

    triples = []
    for r in rels:
        pred, label = RELATION_META[r["predicate"]]
        triples.append({
            "article_id": article_id,
            "subject_id": f"baram:entity/{article_id}/{slug(r['subject'])}",
            "subject": r["subject"],
            "subject_type": RDF_TYPE[r["subject_type"]],
            "predicate": pred,
            "predicate_label": label,
            "object_id": f"baram:entity/{article_id}/{slug(r['object'])}",
            "object": r["object"],
            "object_type": RDF_TYPE[r["object_type"]],
            "confidence": float(r["confidence"]),
            "evidence": r["evidence"] or None,
            "verified": bool(r["verified"]),
        })
    return triples


TRIPLE_SCHEMA = (
    "article_id string, subject_id string, subject string, "
    "subject_type string, predicate string, predicate_label string, "
    "object_id string, object string, object_type string, "
    "confidence double, evidence string, verified boolean"
)


def extract_triples(
    docs: DataFrame,
    id_col: str = "doc_id",
    title_col: str = "title",
    text_col: str = "text",
    relation_fn=None,
    confidence_threshold: float = 0.3,
) -> DataFrame:
    """Distributed triple extraction: one Arrow-batched narrow pass over
    the docs relation — no shuffle; pair with a group-by for the
    triple-stats queries (stats.rs analog).

    ``relation_fn(title, content, article_id) -> list[triple dict]`` is
    the LLM swap point (the reference's OntologyProcessor drives an LLM
    extractor through the same Triple schema; no model ships in this
    container, so the rule extractor is the default — EntitySource::Rule).
    """
    fn = relation_fn
    thr = confidence_threshold

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split()[0] for c in TRIPLE_SCHEMA.split(", ")]
        for pdf in batches:
            rows: list[dict] = []
            for rid, title, text in zip(pdf[id_col], pdf[title_col],
                                        pdf[text_col]):
                if fn is not None:
                    rows.extend(fn(title or "", text or "", str(rid)))
                else:
                    rows.extend(
                        extract_from_article(
                            title or "", text or "", str(rid),
                            confidence_threshold=thr,
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, title_col, text_col).mapInPandas(
        run, schema=TRIPLE_SCHEMA
    )
