"""Query-language surface (SURVEY.md §2.9, ``QueryProcessor.java:49-122``).

Three classes, dispatched exactly like the reference:
* quoted-binary-logical: ``"A" AND|OR|NOT "B"`` — exactly one binary op,
  both operands quoted, no nesting (``QueryProcessor.java:100-122``);
* phrase: leading quote, ``"some words"``; <2 analyzed terms degenerates to
  a term query (``QueryProcessor.java:124-148``);
* term (free text): everything else.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_LOGICAL_RE = re.compile(r'^\s*"([^"]*)"\s+(AND|OR|NOT)\s+"([^"]*)"\s*$')

# proximity: `alpha NEAR/3 beta` (quotes optional) — unordered two-term
# window co-occurrence, an engine extension beyond the reference (Lucene
# SpanNearQuery semantics). Either side analyzing to != 1 term degenerates
# the whole query to free text, mirroring the reference's degeneration
# rules for underfilled phrases.
_NEAR_RE = re.compile(
    r'^\s*"?([A-Za-z]+)"?\s+NEAR/(\d+)\s+"?([A-Za-z]+)"?\s*$'
)

# proximity chain: `a NEAR/2 b NEAR/2 c [...]` — ORDERED span chain over
# n >= 3 terms (Lucene SpanNearQuery inOrder=true): positions p1 < p2 < ...
# < pn with every consecutive gap <= w. The two-term form above stays
# unordered (SpanNear inOrder=false), matching round-4 behavior.
_NEAR_CHAIN_RE = re.compile(
    r"^\s*[A-Za-z]+(?:\s+NEAR/\d+\s+[A-Za-z]+){2,}\s*$"
)

# wildcard token in a free-text query — expanded against the term
# dictionary at serve time. An engine extension beyond the reference (its
# QueryProcessor matches exact terms only). Two tiers:
# * `mach*` (pure trailing star) -> prefix expansion
#   (query/suggest.expand_prefix), which also prefix-highlights snippets;
# * general patterns `m*del`, `*ing`, `s*a*` -> wildcard expansion
#   (query/suggest.expand_wildcard, Lucene WildcardQuery semantics).
_WILDCARD_RE = re.compile(
    r"(?<![A-Za-z*])([A-Za-z]*\*[A-Za-z*]*)(?![A-Za-z*])"
)
_PURE_PREFIX_RE = re.compile(r"^[A-Za-z]+\*$")

# fuzzy token in a free-text query: `lin~` — expanded against the term
# dictionary at serve time (query/suggest.expand_fuzzy, Lucene FuzzyQuery
# semantics: dictionary terms within edit distance 2, ranked dist/df).
# Like the wildcard, an engine extension beyond the reference.
_FUZZY_RE = re.compile(r"\b([A-Za-z]+)~")


# nested boolean: `("A" AND "B") OR "C"` — parenthesized (or multi-op)
# expressions of quoted operands, an engine extension beyond the
# reference's single binary form (Lucene BooleanQuery nesting). Only
# attempted when the query contains a '(' or MORE than one operator, so
# the reference's flat binary form keeps parsing through _LOGICAL_RE
# unchanged (the tree would produce identical semantics anyway).
# Precedence: AND/NOT bind tighter than OR; same-level ops left-assoc
# (`"a" NOT "b" AND "c"` == `("a" NOT "b") AND "c"`). Any malformed
# input (unbalanced parens, dangling op, unquoted operand) degenerates
# to free text like every other malformed form.
_BOOL_TOKEN_RE = re.compile(r'\(|\)|\bAND\b|\bOR\b|\bNOT\b|"[^"]*"')
_BOOL_OP_RE = re.compile(r"\b(?:AND|OR|NOT)\b")


@dataclass
class ParsedQuery:
    kind: str  # 'term' | 'phrase' | 'logical' | 'near' | 'near_chain'
    raw: str
    terms: list[str] | None = None      # term / phrase (analyzed)
    op: str | None = None               # logical
    left: "ParsedQuery | None" = None   # logical
    right: "ParsedQuery | None" = None  # logical
    prefixes: list[str] | None = None   # term: trailing-star prefixes
    wildcards: list[str] | None = None  # term: general `*` patterns
    fuzzies: list[str] | None = None    # term: fuzzy words to expand
    window: int | None = None           # near: max position distance


def _phrase_leaf(inner: str, stem: bool) -> ParsedQuery:
    """Quoted operand -> phrase leaf; <2 analyzed terms degenerates to a
    term leaf (QueryProcessor.java:134-138, same rule as the flat form)."""
    from ..analysis.analyzer import analyze_query

    terms = analyze_query(inner, stem=stem)
    return ParsedQuery("phrase" if len(terms) >= 2 else "term", inner, terms=terms)


def _parse_bool_tree(q: str, stem: bool) -> ParsedQuery | None:
    """Recursive-descent parse of a parenthesized boolean expression whose
    operands are quoted. Returns None (caller degenerates) unless the
    WHOLE input tokenizes cleanly and the grammar accepts it."""
    toks: list[str] = []
    pos = 0
    for m in _BOOL_TOKEN_RE.finditer(q):
        if q[pos : m.start()].strip():
            return None  # stray text between tokens
        toks.append(m.group(0))
        pos = m.end()
    if q[pos:].strip() or not toks:
        return None

    i = 0

    def atom() -> ParsedQuery | None:
        nonlocal i
        if i >= len(toks):
            return None
        t = toks[i]
        if t == "(":
            i += 1
            node = or_expr()
            if node is None or i >= len(toks) or toks[i] != ")":
                return None
            i += 1
            return node
        if t.startswith('"'):
            i += 1
            return _phrase_leaf(t.strip('"'), stem)
        return None

    def and_expr() -> ParsedQuery | None:
        nonlocal i
        node = atom()
        while node is not None and i < len(toks) and toks[i] in ("AND", "NOT"):
            op = toks[i]
            i += 1
            rhs = atom()
            if rhs is None:
                return None
            node = ParsedQuery("logical", q, op=op, left=node, right=rhs)
        return node

    def or_expr() -> ParsedQuery | None:
        nonlocal i
        node = and_expr()
        while node is not None and i < len(toks) and toks[i] == "OR":
            i += 1
            rhs = and_expr()
            if rhs is None:
                return None
            node = ParsedQuery("logical", q, op="OR", left=node, right=rhs)
        return node

    tree = or_expr()
    if tree is None or i != len(toks):
        return None
    # a bare parenthesized phrase `("a b")` folds to its leaf
    return tree


def parse_query(query: str, stem: bool = True) -> ParsedQuery:
    from ..analysis.analyzer import analyze_query

    q = (query or "").strip()
    if '"' in q and ("(" in q or len(_BOOL_OP_RE.findall(q)) >= 2):
        tree = _parse_bool_tree(q, stem)
        if tree is not None:
            return tree
    m = _LOGICAL_RE.match(q)
    if m:
        left = ParsedQuery("phrase", m.group(1), terms=analyze_query(m.group(1), stem=stem))
        right = ParsedQuery("phrase", m.group(3), terms=analyze_query(m.group(3), stem=stem))
        # <2 terms degenerates to a term query, as in QueryProcessor.java:134-138
        for side in (left, right):
            if len(side.terms or []) < 2:
                side.kind = "term"
        return ParsedQuery("logical", q, op=m.group(2), left=left, right=right)
    m = _NEAR_RE.match(q)
    if m:
        from .proximity import MAX_WINDOW

        a = analyze_query(m.group(1), stem=stem)
        b = analyze_query(m.group(3), stem=stem)
        # oversized windows clamp to the kernel's MAX_WINDOW instead of
        # raising downstream (`a NEAR/999 b` is a valid-intent query; every
        # other malformed-query path degenerates rather than crashes)
        w = min(int(m.group(2)), MAX_WINDOW)
        if len(a) == 1 and len(b) == 1 and a != b and w >= 1:
            return ParsedQuery("near", q, terms=a + b, window=w)
        # degenerate (stopword/empty side, same term, zero window): free text
        return ParsedQuery("term", q, terms=a + b)
    if _NEAR_CHAIN_RE.match(q):
        from .proximity import MAX_WINDOW

        parts = re.split(r"\s+NEAR/(\d+)\s+", q.strip())
        words, windows = parts[0::2], {int(x) for x in parts[1::2]}
        sides = [analyze_query(w0, stem=stem) for w0 in words]
        terms = [s[0] for s in sides if len(s) == 1]
        # a well-formed chain: >=3 operands, every operand analyzes to one
        # term, all distinct, ONE shared window value (the per-link gap
        # bound — Lucene SpanNear's single-slop model); otherwise the whole
        # query degenerates to free text like every other malformed form
        if (
            len(terms) == len(sides) >= 3
            and len(set(terms)) == len(terms)
            and len(windows) == 1
        ):
            return ParsedQuery(
                "near_chain", q, terms=terms,
                window=min(min(windows), MAX_WINDOW),
            )
        flat = [t for s in sides for t in s]
        return ParsedQuery("term", q, terms=flat)
    if q.startswith('"'):
        inner = q.strip('"')
        terms = analyze_query(inner, stem=stem)
        kind = "phrase" if len(terms) >= 2 else "term"
        return ParsedQuery(kind, q, terms=terms)
    stars = [m.lower() for m in _WILDCARD_RE.findall(q) if m.strip("*")]
    prefixes = [p[:-1] for p in stars if _PURE_PREFIX_RE.match(p)]
    wildcards = [p for p in stars if not _PURE_PREFIX_RE.match(p)]
    rest = _WILDCARD_RE.sub(" ", q)
    fuzzies = [m.lower() for m in _FUZZY_RE.findall(rest)]
    rest = _FUZZY_RE.sub(" ", rest)
    return ParsedQuery(
        "term", q, terms=analyze_query(rest, stem=stem),
        prefixes=prefixes or None,
        wildcards=wildcards or None,
        fuzzies=fuzzies or None,
    )
