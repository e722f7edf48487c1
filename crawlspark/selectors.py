"""CSS-selector extraction over HTML columns — the goquery-analog surface.

The reference's parse stage is arbitrary CSS selection over the fetched
document (`adapters/parsers/goqueryparser/goquery.go:17-24`, used as
`doc.Find(...)` in `examples/books-to-scrape-simple/bookstoscrape/
collect_job.go:28-69` and `product.go:33-81`). This module gives the Spark
engine the same surface for the constrained synthetic HTML:

Grammar (the subset those call sites use, plus the common goquery idioms
beyond it — round 5 added ``#id``, ``[attr]``, ``[attr=val]`` and ``*``):
  * simple selectors: ``tag``, ``*``, ``.class``, ``#id``, ``[attr]``,
    ``[attr=val]`` / ``[attr="val"]`` / ``[attr='val']``, and any
    conjunction of those qualifiers on one compound, e.g.
    ``a.btn#buy[rel=nofollow]``
  * combinators: descendant (whitespace) and direct child (``>``)
  * a terminal extraction pseudo: ``::text`` (default — all descendant text
    in document order, goquery ``.Text()``), or ``::attr(name)``
    (goquery ``.Attr(name)``; nodes without the attribute are skipped)

Still unsupported (clear ValueError, never a silent mis-match): sibling
combinators (``+``/``~``), ``:nth-child``-family pseudo-classes, and
non-equality attribute operators (``^=``, ``$=``, ``*=``, ``~=``).

Matches come back in document order, like ``Find().Each``.

Execution tier: CSS selection over nested HTML is NOT regular, so a Catalyst
regexp cannot express it in general — this is the sanctioned Pandas-UDF tier
(SURVEY.md custom-operator ladder, step b): a stdlib ``html.parser`` DOM per
document inside an Arrow-batched UDF. Row-local, zero shuffle; at 10^10
documents it is embarrassingly parallel and the batch Arrow transfer
amortizes the Python boundary. The P-3 hot path (harvest EVERY anchor) stays
the pure-Catalyst regexp in engine.py — selectors are for user-Process-style
targeted extraction, where the selector also does the filtering that would
otherwise need child rules or post-hoc regexes.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F

# elements that never take a closing tag — treat as self-closing so a
# forgiving parse never mis-nests what follows them
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# start of <key> implies closing an open <value-member> (the HTML5 implied
# end-tag rules for the elements that commonly omit closers)
_IMPLIED_CLOSE = {
    "li": frozenset({"li"}),
    "p": frozenset({"p"}),
    "td": frozenset({"td", "th"}),
    "th": frozenset({"td", "th"}),
    "tr": frozenset({"tr", "td", "th"}),
    "dt": frozenset({"dt", "dd"}),
    "dd": frozenset({"dt", "dd"}),
    "option": frozenset({"option"}),
}

_SIMPLE_RE = re.compile(
    r"^([a-zA-Z][a-zA-Z0-9-]*|\*)?((?:\.[\w-]+|#[\w-]+|\[[^\]]+\])*)$"
)
_QUAL_RE = re.compile(r"\.[\w-]+|#[\w-]+|\[[^\]]+\]")
_ATTR_RE = re.compile(r"^\[\s*([\w-]+)\s*(?:=\s*(.*?)\s*)?\]$")


def _split_compounds(sel: str) -> list[tuple[str, str]]:
    """Split a selector into (combinator, compound) pairs, bracket-aware so
    ``a[title="next page"]`` keeps its quoted space. comb ∈ {' ', '>'};
    the first compound's comb is ' '."""
    out: list[tuple[str, str]] = []
    buf: list[str] = []
    comb, depth = " ", 0
    for ch in sel:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth = max(depth - 1, 0)
        if depth == 0 and ch in (" ", "\t", ">"):
            if buf:
                out.append((comb, "".join(buf)))
                buf, comb = [], " "
            if ch == ">":
                comb = ">"
            continue
        buf.append(ch)
    if buf:
        out.append((comb, "".join(buf)))
    elif comb == ">":
        raise ValueError(f"selector ends with a dangling '>': {sel!r}")
    return out


class _Node:
    __slots__ = ("tag", "attrs", "classes", "parent", "children")

    def __init__(self, tag: str, attrs: dict, parent: "_Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.classes = frozenset((attrs.get("class") or "").split())
        self.parent = parent
        self.children: list = []  # _Node | str interleaved, document order


class _Builder(HTMLParser):
    """Forgiving tree builder: unclosed tags pop to the nearest matching
    open ancestor (browsers' adoption behavior, enough for synthetic HTML)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("", {}, None)
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        implied = _IMPLIED_CLOSE.get(tag)
        while implied and len(self._stack) > 1 and self._stack[-1].tag in implied:
            self._stack.pop()
        node = _Node(tag, dict(attrs), self._stack[-1])
        self._stack[-1].children.append(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._stack[-1].children.append(_Node(tag, dict(attrs), self._stack[-1]))

    def handle_endtag(self, tag):
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def _parse_html(text: str) -> _Node:
    b = _Builder()
    b.feed(text)
    return b.root


def compile_selector(selector: str):
    """selector → (parts, extract) where parts =
    [(comb, tag, classes, attr_conds), ...] (comb ∈ {' ', '>'}, first part's
    comb is ' '; attr_conds = tuple of (name, value_or_None) — None means
    presence-only) and extract is ('text',) or ('attr', name)."""
    sel, _, pseudo = selector.partition("::")
    if not pseudo or pseudo == "text":
        extract = ("text",)
    elif pseudo.startswith("attr(") and pseudo.endswith(")"):
        extract = ("attr", pseudo[5:-1].strip())
    else:
        raise ValueError(f"unsupported extraction pseudo ::{pseudo}")
    sel = sel.strip()
    if not sel:
        raise ValueError("empty selector")
    parts = [(comb, *_simple(tok)) for comb, tok in _split_compounds(sel)]
    if not parts:
        raise ValueError("empty selector")
    return parts, extract


def _simple(token: str) -> tuple[str, frozenset, tuple]:
    m = _SIMPLE_RE.match(token)
    if not m or (not m.group(1) and not m.group(2)):
        raise ValueError(f"unsupported simple selector {token!r}")
    tag = (m.group(1) or "").lower()
    if tag == "*":
        tag = ""
    classes: set[str] = set()
    conds: list[tuple[str, str | None]] = []
    for qual in _QUAL_RE.findall(m.group(2)):
        if qual.startswith("."):
            classes.add(qual[1:])
        elif qual.startswith("#"):
            conds.append(("id", qual[1:]))
        else:
            am = _ATTR_RE.match(qual)
            if not am:
                # covers the non-equality operators too: ^= $= *= ~= |=
                # all fail the name-then-'=' shape and land here
                raise ValueError(f"unsupported attribute selector {qual!r}")
            name, val = am.group(1).lower(), am.group(2)
            if val is not None and len(val) >= 2 and val[0] == val[-1] and val[0] in "'\"":
                val = val[1:-1]
            conds.append((name, val))
    return tag, frozenset(classes), tuple(conds)


def _matches(node: _Node, tag: str, classes: frozenset, conds: tuple) -> bool:
    if not node.tag or (tag and node.tag != tag) or not classes <= node.classes:
        return False
    for name, val in conds:
        have = node.attrs.get(name)
        if have is None or (val is not None and have != val):
            return False
    return True


def _path_match(node: _Node, parts, i: int) -> bool:
    # right-to-left: node must match parts[i] with the left chain satisfied
    if not _matches(node, parts[i][1], parts[i][2], parts[i][3]):
        return False
    if i == 0:
        return True
    p = node.parent
    if parts[i][0] == ">":
        return p is not None and _path_match(p, parts, i - 1)
    while p is not None:
        if _path_match(p, parts, i - 1):
            return True
        p = p.parent
    return False


def _text(node: _Node) -> str:
    out: list[str] = []
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            out.append(n)
        else:
            stack.extend(reversed(n.children))
    return "".join(out)


def select(html_text: str, compiled) -> list[str]:
    """All matches of a compiled selector, extracted, in document order."""
    parts, extract = compiled
    out: list[str] = []
    stack = list(reversed(_parse_html(html_text).children))
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            continue
        if _path_match(n, parts, len(parts) - 1):
            if extract[0] == "text":
                out.append(_text(n))
            else:
                v = n.attrs.get(extract[1])
                if v is not None:
                    out.append(v)
        stack.extend(reversed(n.children))
    return out


def select_css(html_text: str, selector: str) -> list[str]:
    """One-shot driver-side variant (tests, small fixtures)."""
    return select(html_text, compile_selector(selector))


def css_select_udf(selector: str):
    """Arrow-batched column form: html column → array<string> of matches."""
    compiled = compile_selector(selector)

    @F.pandas_udf("array<string>")
    def _sel(body: pd.Series) -> pd.Series:
        return body.map(lambda h: None if h is None else select(h, compiled))

    return _sel


def links_by_type_udf(type_selectors: dict[str, tuple[str, ...]]):
    """Engine integration (P-3 via selectors): (job_type, body_html) →
    array<string> of links, the concatenation of each of the job type's
    selectors' matches in selector order (collect_job.go harvests product
    links then the next-page link, in that order). Types WITHOUT selectors
    return null so the caller's coalesce falls back to the generic anchor
    regexp — the zero-config path stays pure Catalyst."""
    compiled = {
        t: [compile_selector(s) for s in sels] for t, sels in type_selectors.items()
    }

    @F.pandas_udf("array<string>")
    def _links(job_type: pd.Series, body: pd.Series) -> pd.Series:
        out: list = []
        for t, h in zip(job_type.to_numpy(), body.to_numpy()):
            sels = compiled.get(t)
            if sels is None or h is None:
                out.append(None)
                continue
            acc: list[str] = []
            for c in sels:
                acc.extend(select(h, c))
            out.append(acc)
        return pd.Series(out, dtype=object)

    return _links
