"""Minimal HTML DOM + CSS-selector engine (stdlib only).

The container ships no HTML parsing library, so this module implements the
small selector subset the extraction spec needs (see
``/root/reference/src/parser/selectors.rs:16-172``):

- compound selectors: ``tag``, ``#id``, ``.class``, ``tag.class``,
  ``tag#id``, ``[attr*='v']``, ``tag[attr*='v']``
- combinators: descendant (whitespace) and child (``>``)
- comma-separated selector lists

Two properties matter for byte-identical extraction parity:

1. ``Element.html`` returns the element's ORIGINAL source substring (we track
   byte offsets during parsing), so the reference's noise removal — which
   string-replaces serialized noise HTML out of serialized content HTML
   (``/root/reference/src/parser/html.rs:329-341``) — is reproduced exactly.
2. ``Element.text`` concatenates descendant text nodes in document order with
   entities decoded once, matching the scraper crate's ``element.text()``.
"""

from __future__ import annotations

import html as _htmllib
import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Node:
    __slots__ = ()


class TextNode(Node):
    __slots__ = ("text",)

    def __init__(self, text: str):
        self.text = text


class Element(Node):
    __slots__ = ("tag", "attrs", "children", "parent", "start", "end", "_doc")

    def __init__(self, tag: str, attrs: dict, start: int):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node] = []
        self.parent: Element | None = None
        self.start = start
        self.end = -1
        self._doc: "Document | None" = None

    @property
    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()

    def text(self) -> str:
        """Concatenated descendant text, document order, entities decoded."""
        parts: list[str] = []
        stack: list[Node] = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, TextNode):
                parts.append(node.text)
            else:
                stack.extend(reversed(node.children))
        return "".join(parts)

    def html(self) -> str:
        """Outer HTML — the exact original source substring."""
        if self._doc is None or self.end < 0:
            return ""
        return self._doc.source[self.start : self.end]

    def iter(self):
        """Depth-first pre-order walk over descendant elements (incl. self)."""
        yield self
        for child in self.children:
            if isinstance(child, Element):
                yield from child.iter()


@dataclass
class _Part:
    """One compound selector: tag?, id?, classes, (attr, substr) pairs."""

    tag: str | None = None
    id: str | None = None
    classes: tuple = ()
    attrs: tuple = ()  # ((name, substring), ...) for [name*='substring']

    def matches(self, el: Element) -> bool:
        if self.tag is not None and el.tag != self.tag:
            return False
        if self.id is not None and el.attrs.get("id") != self.id:
            return False
        if self.classes:
            have = el.classes
            if any(c not in have for c in self.classes):
                return False
        for name, op, want in self.attrs:
            val = el.attrs.get(name)
            if val is None:
                return False
            if op == "*=":
                if want not in val:
                    return False
            elif val != want:  # '=' is EXACT match (CSS semantics)
                return False
        return True


_PART_RE = re.compile(
    r"""
    (?P<tag>[a-zA-Z][\w-]*)?
    (?P<rest>(?:\#[\w-]+|\.[\w-]+|\[[^\]]+\])*)
    """,
    re.VERBOSE,
)
_TOKEN_RE = re.compile(
    r"\#([\w-]+)|\.([\w-]+)|\[([\w-]+)(\*?=)['\"]?([^'\"\]]*)['\"]?\]"
)


def _parse_compound(text: str) -> _Part:
    m = _PART_RE.match(text)
    if not m or m.end() != len(text):
        raise ValueError(f"unsupported selector part: {text!r}")
    part = _Part(tag=m.group("tag").lower() if m.group("tag") else None)
    classes: list[str] = []
    attrs: list[tuple] = []
    for tok in _TOKEN_RE.finditer(m.group("rest") or ""):
        if tok.group(1):
            part.id = tok.group(1)
        elif tok.group(2):
            classes.append(tok.group(2))
        else:
            attrs.append(
                (tok.group(3).lower(), tok.group(4), tok.group(5))
            )
    part.classes = tuple(classes)
    part.attrs = tuple(attrs)
    return part


_SELECTOR_CACHE: dict = {}


@dataclass
class Selector:
    """A parsed selector list. ``parse('#a span, .b > em')`` (memoized)."""

    chains: list  # list of [( _Part, combinator ), ...]; combinator for part i
    # is how part i relates to part i+1 ('desc' or 'child'); last is None.

    @classmethod
    def parse(cls, text: str) -> "Selector":
        cached = _SELECTOR_CACHE.get(text)
        if cached is not None:
            return cached
        chains = []
        for alt in text.split(","):
            alt = alt.strip()
            if not alt:
                continue
            # tokenize on '>' keeping descendant whitespace
            tokens = re.split(r"\s*(>)\s*|\s+", alt)
            parts: list[_Part] = []
            combs: list[str] = []
            pending_comb = None
            for tok in tokens:
                if tok is None or tok == "":
                    continue
                if tok == ">":
                    # relates the NEXT pair — recorded when the next
                    # compound arrives (the old code rewrote the
                    # PREVIOUS pair, or dropped a leading '>')
                    pending_comb = "child"
                    continue
                if parts:
                    combs.append(pending_comb or "desc")
                pending_comb = None
                parts.append(_parse_compound(tok))
            chains.append((parts, combs))
        sel = cls(chains)
        _SELECTOR_CACHE[text] = sel
        return sel

    def _chain_matches(self, el: Element, parts: list, combs: list) -> bool:
        if not parts[-1].matches(el):
            return False
        return self._match_up(el, parts, combs, len(parts) - 2)

    def _match_up(self, el: Element, parts, combs, idx: int) -> bool:
        if idx < 0:
            return True
        comb = combs[idx]  # relation between parts[idx] and parts[idx+1]
        parent = el.parent
        if comb == "child":
            if parent is None or not parts[idx].matches(parent):
                return False
            return self._match_up(parent, parts, combs, idx - 1)
        # descendant: any ancestor may match
        while parent is not None:
            if parts[idx].matches(parent) and self._match_up(
                parent, parts, combs, idx - 1
            ):
                return True
            parent = parent.parent
        return False

    def matches(self, el: Element) -> bool:
        return any(self._chain_matches(el, parts, combs) for parts, combs in self.chains)


class Document:
    """Parsed HTML document with indexed, document-order selection.

    id/class/tag indexes are built once at parse time so a lookup tests only
    the candidate set of the chain's rightmost compound (instead of walking
    the whole tree per selector — the extraction path probes dozens of
    selectors per page)."""

    def __init__(self, source: str, root: Element):
        self.source = source
        self.root = root
        self._order: dict[int, int] = {}
        self._by_id: dict[str, list] = {}
        self._by_class: dict[str, list] = {}
        self._by_tag: dict[str, list] = {}
        for i, el in enumerate(root.iter()):
            el._doc = self
            self._order[id(el)] = i
            if el is root:
                continue
            eid = el.attrs.get("id")
            if eid:
                self._by_id.setdefault(eid, []).append(el)
            for c in el.classes:
                self._by_class.setdefault(c, []).append(el)
            self._by_tag.setdefault(el.tag, []).append(el)

    def _candidates(self, part: _Part) -> list:
        """Narrowest candidate list for a compound part (document order)."""
        if part.id is not None:
            return self._by_id.get(part.id, [])
        if part.classes:
            lists = [self._by_class.get(c, []) for c in part.classes]
            return min(lists, key=len)
        if part.tag is not None:
            return self._by_tag.get(part.tag, [])
        # attribute-only selector: fall back to every element
        return [el for el in self.root.iter() if el is not self.root]

    def select(self, selector: str | Selector):
        sel = Selector.parse(selector) if isinstance(selector, str) else selector
        hits: list = []
        seen: set[int] = set()
        for parts, combs in sel.chains:
            last = parts[-1]
            for el in self._candidates(last):
                if id(el) in seen:
                    continue
                if last.matches(el) and sel._match_up(
                    el, parts, combs, len(parts) - 2
                ):
                    seen.add(id(el))
                    hits.append(el)
        hits.sort(key=lambda e: self._order[id(e)])
        yield from hits

    def select_first(self, selector: str | Selector) -> Element | None:
        return next(self.select(selector), None)


class _Builder(HTMLParser):
    def __init__(self, source: str):
        super().__init__(convert_charrefs=False)
        self.source = source
        # line-start offsets for getpos() -> absolute offset conversion
        self._line_offsets = [0]
        pos = source.find("\n")
        while pos >= 0:
            self._line_offsets.append(pos + 1)
            pos = source.find("\n", pos + 1)
        self.root = Element("[document]", {}, 0)
        self.root.end = len(source)
        self.stack = [self.root]

    def _abs(self) -> int:
        line, col = self.getpos()
        return self._line_offsets[line - 1] + col

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        el = Element(tag, {k.lower(): (v or "") for k, v in attrs}, self._abs())
        el.parent = self.stack[-1]
        self.stack[-1].children.append(el)
        if tag in VOID_TAGS:
            el.end = self._abs() + len(self.get_starttag_text() or "")
        else:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        tag = tag.lower()
        el = Element(tag, {k.lower(): (v or "") for k, v in attrs}, self._abs())
        el.parent = self.stack[-1]
        el.end = self._abs() + len(self.get_starttag_text() or "")
        self.stack[-1].children.append(el)

    def handle_endtag(self, tag):
        tag = tag.lower()
        # find matching open element (tolerate unbalanced markup)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                pos = self._abs()
                gt = self.source.find(">", pos)
                end = (gt + 1) if gt >= 0 else pos
                while len(self.stack) > i:
                    closed = self.stack.pop()
                    closed.end = end
                return
        # stray end tag: ignore

    def _append_text(self, text: str):
        parent = self.stack[-1]
        children = parent.children
        if children and isinstance(children[-1], TextNode):
            children[-1].text += text
        else:
            children.append(TextNode(text))

    def handle_data(self, data):
        self._append_text(data)

    def handle_entityref(self, name):
        self._append_text(_htmllib.unescape(f"&{name};"))

    def handle_charref(self, name):
        self._append_text(_htmllib.unescape(f"&#{name};"))

    def close(self):
        super().close()
        for el in self.stack[1:]:
            el.end = len(self.source)
        del self.stack[1:]


def parse_html(source: str) -> Document:
    """Parse an HTML string into a selectable Document."""
    builder = _Builder(source)
    builder.feed(source)
    builder.close()
    return Document(source, builder.root)
