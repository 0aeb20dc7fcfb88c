"""Surround query language — a string surface for span queries.

Subset of the reference's surround parser
(queryparser/surround/parser/QueryParser.jj):

    or_expr  := and_expr (OR and_expr)*
    and_expr := not_expr (AND not_expr)*
    not_expr := dist     (NOT dist)*
    dist     := primary ((nW | nN) primary)*      # infix, same-op chain
              | nW(p, p, ...) | nN(p, p, ...)     # prefix form
    primary  := term | trunc* | tr?nc | ( or_expr )

Operators are case-insensitive; W/N distance defaults to 1 (`W` == `1W`,
QueryParser.jj getOpDistance); a distance query maps to
SpanNearQuery(slop = distance - 1, ordered = W / unordered = N)
(surround/query/DistanceQuery.java distanceSubQueryNotAllowed +
getSpanNearQuery).  Truncated terms inside a distance context become
SpanMultiTermQueryWrapper expansions (span_multi); AND/OR/NOT compose
as boolean nodes at the top level, and OR of plain terms inside a
distance context becomes SpanOr.  NOT inside a distance op is rejected
like the reference ("distance subquery not allowed").
"""

from __future__ import annotations

import re

from .parser import QueryParseError

_TOK = re.compile(
    r"\(|\)|,|\d+[wWnN]\b|[wWnN]\b(?=\s*\()|"
    r"[A-Za-z0-9_*?]+"
)


def _lex(text: str) -> list[str]:
    return _TOK.findall(text)


_DIST = re.compile(r"^(\d*)([wWnN])$")


class _P:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse_or(self):
        parts = [self.parse_and()]
        while self.peek() and self.peek().upper() == "OR":
            self.next()
            parts.append(self.parse_and())
        if len(parts) == 1:
            return parts[0]
        return ("or", [_to_bool(p) for p in parts])

    def parse_and(self):
        parts = [self.parse_not()]
        while self.peek() and self.peek().upper() == "AND":
            self.next()
            parts.append(self.parse_not())
        if len(parts) == 1:
            return parts[0]
        return ("and", [_to_bool(p) for p in parts])

    def parse_not(self):
        node = self.parse_dist()
        while self.peek() and self.peek().upper() == "NOT":
            self.next()
            node = ("andnot", _to_bool(node), _to_bool(self.parse_dist()))
        return node

    def _dist_tok(self):
        t = self.peek()
        if t is None:
            return None
        m = _DIST.match(t)
        if not m or t.upper() in ("OR", "AND", "NOT"):
            return None
        return m

    def parse_dist(self):
        m = self._dist_tok()
        if m is not None and self.toks[self.i + 1 : self.i + 2] == ["("]:
            # prefix form: nW(a, b, ...)
            self.next()
            dist = int(m.group(1) or 1)
            ordered = m.group(2).upper() == "W"
            self.next()  # '('
            subs = [self.parse_or()]
            while self.peek() == ",":
                self.next()
                subs.append(self.parse_or())
            if self.next() != ")":
                raise QueryParseError("expected ')'")
            return self._near(subs, dist, ordered)
        node = self.parse_primary()
        # infix chain with one distance operator
        m = self._dist_tok()
        if m is None:
            return node
        op = (int(m.group(1) or 1), m.group(2).upper())
        subs = [node]
        while (m2 := self._dist_tok()) is not None:
            op2 = (int(m2.group(1) or 1), m2.group(2).upper())
            if op2 != op:
                # mixed operators nest left (infix OperatorsQuery)
                subs = [self._near(subs, op[0], op[1] == "W")]
                op = op2
            self.next()
            subs.append(self.parse_primary())
        return self._near(subs, op[0], op[1] == "W")

    def _near(self, subs, dist: int, ordered: bool):
        return (
            "span_near", [_to_span(s) for s in subs], dist - 1, ordered
        )

    def parse_primary(self):
        t = self.peek()
        if t is None:
            raise QueryParseError("unexpected end of surround query")
        if t == "(":
            self.next()
            node = self.parse_or()
            if self.next() != ")":
                raise QueryParseError("expected ')'")
            return node
        if t in (")", ","):
            raise QueryParseError(f"unexpected {t!r}")
        self.next()
        low = t.lower()
        if "*" in low or "?" in low:
            if low.endswith("*") and "*" not in low[:-1] and "?" not in low:
                return ("prefix", low[:-1])
            return ("wildcard", low)
        return ("term", low)


def _to_span(node):
    """Boolean-context node -> span clause (DistanceQuery.java rejects
    non-span subqueries: 'distance subquery not allowed')."""
    kind = node[0]
    if kind == "term":
        return ("sterm", node[1])
    if kind in ("prefix", "wildcard"):
        return ("span_multi", node)
    if kind == "or":
        subs = [_to_span(c) for c in node[1]]
        if all(s[0] == "sterm" for s in subs):
            return ("sor", [s[1] for s in subs])
        # general OR inside a distance op: a 1-clause near per sub is
        # not in the reference subset; treat as SpanOr of terms only
        raise QueryParseError(
            "distance subquery not allowed: OR of non-terms"
        )
    if kind in ("span_near",) or kind in (
        "sor", "sterm", "span_multi", "span_first", "span_not",
        "span_containing", "span_within", "span_range",
    ):
        return node
    raise QueryParseError(f"distance subquery not allowed: {kind}")


def _to_bool(node):
    """Span-context node used at the boolean level stays as-is (the
    engine scores span nodes directly); plain term/prefix/wildcard/or
    nodes already are boolean nodes."""
    return node


def parse_surround(text: str):
    """Parse a surround query into the engine query tree."""
    toks = _lex(text)
    if not toks:
        return None
    p = _P(toks)
    node = p.parse_or()
    if p.peek() is not None:
        raise QueryParseError(
            f"trailing input at token {p.i}: {p.peek()!r}"
        )
    return node
