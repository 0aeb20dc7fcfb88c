"""Highlighting — the UnifiedHighlighter role, position-based.

The reference's UnifiedHighlighter (lucene/highlighter/.../uhighlight/
UnifiedHighlighter.java) extracts query terms/spans, finds match
offsets in each top document, and formats scored passages.  Our index
stores positions (not char offsets), so passages here are TOKEN
windows over the analyzer's token stream; matches are enumerated with
the shared span machinery (query/spans.py) — exactly how the reference
highlights phrase/span queries (MemoryIndex + span rewrite).  Passage
selection is the first `max_passages` matches in position order (the
PostingsHighlighter default-BreakIterator discipline, simplified from
BM25 passage scoring — a documented deviation).
"""

from __future__ import annotations

import numpy as np

from ..analysis.analyzer import _TOKEN_RE, analyze_detailed
from .spans import SPAN_KINDS, doc_spans


def as_span_clause(node):
    """Query node -> span clause for match enumeration, or None when
    the node has no positional interpretation (boolean trees fall back
    to highlighting every text term)."""
    kind = node[0]
    if kind == "term":
        return ("sterm", node[1])
    if kind == "const_or":
        return ("sor", list(node[1]))
    if kind == "or" and all(c[0] == "term" for c in node[1]):
        return ("sor", [c[1] for c in node[1]])
    if kind == "phrase":
        clauses = node[1]
        slop = node[2] if len(node) > 2 else 0
        # analyzer position gaps (stopword holes) widen the near slop
        gap = max(r for _, r in clauses) - (len(clauses) - 1)
        return (
            "span_near", [("sterm", t) for t, _ in clauses],
            slop + gap, True,
        )
    if kind in SPAN_KINDS:
        return node
    return None


def _text_terms(node) -> list[str]:
    kind = node[0]
    if kind == "term":
        return [node[1]]
    if kind == "const_or":
        return list(node[1])
    if kind == "phrase":
        return [t for t, _ in node[1]]
    if kind in SPAN_KINDS:
        from .spans import span_terms

        return span_terms(node)
    if kind in ("andnot", "reqopt", "reqfilter"):
        return _text_terms(node[1]) + _text_terms(node[2])
    if kind in ("boost", "filter0"):
        return _text_terms(node[1])
    if kind in ("and", "or"):
        return [t for c in node[1] for t in _text_terms(c)]
    if kind == "msm_or":
        return [t for c in node[2] for t in _text_terms(c)]
    return []


def doc_highlights(text: str, node, window: int = 3,
                   max_passages: int = 3, pre: str = "<b>",
                   post: str = "</b>", wrap: bool = True) -> list[str]:
    """Snippets for one document: token windows of +-`window` around
    each match span, matched tokens wrapped pre/post."""
    tokens = _TOKEN_RE.findall(text)
    terms, poss = analyze_detailed(text)
    pos_of: dict[str, list[int]] = {}
    for t, p in zip(terms, poss):
        pos_of.setdefault(t, []).append(p)
    arrs = {t: np.asarray(ps, dtype=np.int64) for t, ps in pos_of.items()}

    clause = as_span_clause(node)
    if clause is None:
        ts = sorted(set(_text_terms(node)))
        if not ts:
            return []
        clause = ("sor", ts)
    spans = doc_spans(clause, lambda t: arrs.get(t))
    if not spans:
        return []
    out = []
    for s, e, _w in spans[:max_passages]:
        lo = max(0, s - window)
        hi = min(len(tokens), e + window)
        frag = []
        for i in range(lo, hi):
            tok = tokens[i]
            if wrap and s <= i < e:
                tok = f"{pre}{tok}{post}"
            frag.append(tok)
        out.append(" ".join(frag))
    return out


def highlight_topk_df(searcher, transcripts, query, k: int = 10,
                      **kw):
    """Distributed highlight: top-k hits joined back to stored text
    (broadcast fetch), snippets computed in an Arrow-batched kernel on
    executors — at scale only k documents' text ever moves."""
    import pandas as pd

    from .parser import parse_query

    node = parse_query(query) if isinstance(query, str) else query
    top = searcher.fetch_topk_with_source(query, transcripts, k)
    st = searcher._st

    def run(batches):
        for pdf in batches:
            snips = [
                " … ".join(doc_highlights(t, node, **kw))
                for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "score": pdf["score"],
                 "snippet": snips}
            )

    return top.mapInPandas(run, f"doc_id long, score {st}, snippet string")
