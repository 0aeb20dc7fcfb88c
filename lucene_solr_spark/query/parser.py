"""Boolean query parser for the north-star surface: terms, AND/&&, OR/||,
parentheses, with classic-QueryParser analysis of query text.

Grammar subset of lucene/queryparser/.../classic/QueryParser.jj:196-226;
query atoms run through the same analyzer as indexing, so stopwords vanish
(an all-stopword query is empty -> matches nothing) and atoms that analyze
to multiple terms become an implicit OR of those terms.

Output: the oracle/engine query tree
    ("term", t) | ("and", [nodes]) | ("or", [nodes])
with single-clause boolean nodes collapsed (BooleanQuery.java:208-234
one-clause rewrite).
"""

from __future__ import annotations

import re

from ..analysis import analyze_query_terms

_TOKENS_RE = re.compile(r"\(|\)|&&|\|\||[^\s()]+")


class QueryParseError(ValueError):
    pass


def _lex(text: str) -> list[str]:
    return _TOKENS_RE.findall(text)


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    # or_expr := and_expr ((OR | <juxtaposition>) and_expr)*
    # juxtaposed clauses use the default operator OR (QueryParser default
    # operator SHOULD, QueryParser.jj)
    def parse_or(self):
        parts = [self.parse_and()]
        while True:
            t = self.peek()
            if t in ("OR", "||"):
                self.next()
                parts.append(self.parse_and())
            elif t is not None and t != ")":
                parts.append(self.parse_and())
            else:
                break
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else ("or", parts)

    # and_expr := atom (AND atom)*
    def parse_and(self):
        parts = [self.parse_atom()]
        while self.peek() in ("AND", "&&"):
            self.next()
            parts.append(self.parse_atom())
        kept = [p for p in parts if p is not None]
        if len(parts) > 1 and not kept:
            return None
        if not kept:
            return None
        return kept[0] if len(kept) == 1 else ("and", kept)

    def parse_atom(self):
        t = self.peek()
        if t is None:
            raise QueryParseError("unexpected end of query")
        if t == "(":
            self.next()
            node = self.parse_or()
            if self.next() != ")":
                raise QueryParseError("expected ')'")
            return node
        if t == ")":
            raise QueryParseError("unexpected ')'")
        self.next()
        terms = analyze_query_terms(t)
        if not terms:
            return None  # stopword / too-long atom: removed by analysis
        if len(terms) == 1:
            return ("term", terms[0])
        return ("or", [("term", x) for x in terms])


def parse_query(text: str):
    """Parse to a query tree; returns None for a query that is empty after
    analysis (matches no documents)."""
    toks = _lex(text)
    if not toks:
        return None
    p = _Parser(toks)
    node = p.parse_or()
    if p.peek() is not None:
        raise QueryParseError(f"trailing input at token {p.i}: {p.peek()!r}")
    return node
