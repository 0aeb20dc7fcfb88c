"""Highlighting — the UnifiedHighlighter role, position-based.

The reference's UnifiedHighlighter (lucene/highlighter/.../uhighlight/
UnifiedHighlighter.java) extracts query terms/spans, finds match
offsets in each top document, and formats scored passages.  Our index
stores positions (not char offsets), so passages here are TOKEN
windows over the analyzer's token stream; matches are enumerated with
the shared span machinery (query/spans.py) — exactly how the reference
highlights phrase/span queries (MemoryIndex + span rewrite).

Passage selection follows PassageScorer.java:79-117 ("each passage is
scored as a miniature document within the document", norm * BM25):
window-extended match spans merge into passages, each scored
norm(start) * sum over scoring terms of weight(contentLength, ttf) *
tf(freqInPassage, passageLen), the top `max_passages` by (score DESC,
start ASC) survive (FieldHighlighter.java:147-155 passage queue), and
survivors are emitted in ascending start order
(FieldHighlighter.java:227).  Documented deviations: lengths count
TOKENS not chars (pivot defaults to 10 tokens ~ the reference's 87
chars), passage bounds are match windows rather than BreakIterator
sentences, and a scoring term's in-passage freq counts every
occurrence of the term (identical to the reference for term/or
queries; for phrase/span queries the reference counts only positions
inside matches).
"""

from __future__ import annotations

import math

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


#: PassageScorer.java:56 defaults (pivot re-based to tokens: 10 tokens
#: ~ the reference's "87 ... typical average english sentence length"
#: in chars)
PASSAGE_K1, PASSAGE_B, PASSAGE_PIVOT = 1.2, 0.75, 10.0


def _score_passage(lo: int, hi: int, n_tokens: int, sterms, arrs,
                   pivot: float = PASSAGE_PIVOT) -> float:
    """PassageScorer.java:79-117 in double over token counts:
    norm(lo) * sum_t weight(contentLength, ttf_t) * tf(freq_t, len)."""
    k1, b = PASSAGE_K1, PASSAGE_B
    plen = hi - lo
    score = 0.0
    for t in sterms:
        ps = arrs.get(t)
        if ps is None or ps.size == 0:
            continue
        tfp = int(((ps >= lo) & (ps < hi)).sum())
        if tfp == 0:
            continue
        num_docs = 1.0 + n_tokens / pivot
        w = (k1 + 1.0) * math.log(1.0 + (num_docs + 0.5) / (ps.size + 0.5))
        tfn = tfp / (tfp + k1 * ((1.0 - b) + b * plen / pivot))
        score += w * tfn
    return score * (1.0 + 1.0 / math.log(pivot + lo))


def doc_passages(text: str, node, window: int = 3,
                 max_passages: int = 3,
                 pivot: float = PASSAGE_PIVOT):
    """Scored passages for one document: window-extended match spans
    merged into maximal token intervals, each scored per
    PassageScorer; returns the top `max_passages` by (score DESC,
    start ASC), re-sorted ascending by start — plus the tokens and raw
    match spans for the formatter.  -> (tokens, spans,
    [(lo, hi, score)])."""
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
            return tokens, [], []
        clause = ("sor", ts)
    spans = doc_spans(clause, lambda t: arrs.get(t))
    if not spans:
        return tokens, [], []
    n = len(tokens)
    ivs = sorted((max(0, s - window), min(n, e + window))
                 for s, e, _w in spans)
    merged: list[list[int]] = []
    for lo, hi in ivs:
        if merged and lo <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    from .spans import span_terms

    sterms = sorted(set(span_terms(clause, scoring=True, top=True)))
    scored = [
        (lo, hi, _score_passage(lo, hi, n, sterms, arrs, pivot))
        for lo, hi in merged
    ]
    top = sorted(scored, key=lambda x: (-x[2], x[0]))[:max_passages]
    return tokens, spans, sorted(top, key=lambda x: x[0])


def doc_highlights(text: str, node, window: int = 3,
                   max_passages: int = 3, pre: str = "<b>",
                   post: str = "</b>", wrap: bool = True) -> list[str]:
    """Snippets for one document: the top `max_passages` BM25-scored
    passages (PassageScorer discipline — see module docstring), matched
    tokens wrapped pre/post, emitted in document order."""
    tokens, spans, passages = doc_passages(
        text, node, window=window, max_passages=max_passages
    )
    if not passages:
        return []
    match_pos = set()
    if wrap:
        for s, e, _w in spans:
            match_pos.update(range(s, e))
    out = []
    for lo, hi, _score in passages:
        frag = []
        for i in range(lo, hi):
            tok = tokens[i]
            if wrap and i in match_pos:
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
