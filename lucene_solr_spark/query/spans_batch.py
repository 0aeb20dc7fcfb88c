"""Batch (all-candidate-docs-at-once) span evaluation.

`query/spans.py` is the per-document executable spec of the reference's
span machinery (NearSpansOrdered.java / NearSpansUnordered.java /
ContainSpans.java / SpanNotQuery.java / SpanPositionRangeQuery.java).
This module re-expresses the SAME enumeration over every candidate doc
simultaneously with numpy, so neither the serving engine nor the
distributed executor kernel runs per-document Python (VERDICT r3 item 1).

Representation: a `BatchSpans` holds the span sets of all docs in CSR
form — `starts/ends/widths` flat int64 arrays, `offsets[j]:offsets[j+1]`
the slice of doc j, spans sorted by (start, end, width) within each doc
(the order `doc_spans` yields after its `sorted()`).  "No match" is an
empty slice; `doc_spans`'s None and [] behave identically downstream, so
one representation suffices.

Vectorization strategy per shape:

- ordered near: enumerate round k = the k-th clause-0 span of every doc
  at once.  The reference's per-doc advance pointers persist across
  clause-0 iterations (NearSpansOrdered.java:95-125); because each
  clause's spans are sorted by start, "advance while start < prevEnd"
  from a persistent pointer equals max(pointer, searchsorted(starts,
  prevEnd)) — exact, including the non-monotone-ends case where a naive
  independent searchsorted would resurrect passed spans.
- unordered near: lockstep state machine — one queue transition of every
  doc per round (NearSpansUnordered.java:193-259; the PhraseQueue min is
  the lexicographic (start, end, cell) argmin, matching spans.py's
  declared tie-break by clause index).
- containing: round k = the k-th big span everywhere; the little pointer
  advances on sorted starts, so searchsorted+max again.
- within: the big pointer advances on span ENDS, which are not sorted,
  so a true lockstep (one pointer step per round) reproduces the
  two-pointer walk.
- not: per-doc prefix-max of exclude ends (segment cummax via the
  doc<<32 offset trick) + one searchsorted answers "does any exclude
  span intersect [start-pre, end+post)" for all include spans at once.
"""

from __future__ import annotations

import numpy as np

_E = np.empty(0, np.int64)


class BatchSpans:
    """Span sets of n docs in CSR form, per-doc sorted by
    (start, end, width)."""

    __slots__ = ("starts", "ends", "widths", "offsets")

    def __init__(self, starts, ends, widths, offsets):
        self.starts = starts
        self.ends = ends
        self.widths = widths
        self.offsets = offsets

    @property
    def n_docs(self) -> int:
        return self.offsets.size - 1

    def counts(self) -> np.ndarray:
        return np.diff(self.offsets)

    def doc_ids(self) -> np.ndarray:
        return np.repeat(
            np.arange(self.n_docs, dtype=np.int64), self.counts()
        )

    def doc_list(self, j: int) -> list[tuple[int, int, int]]:
        """Doc j's spans as (start, end, width) tuples — test/debug."""
        s, e = int(self.offsets[j]), int(self.offsets[j + 1])
        return list(zip(self.starts[s:e].tolist(),
                        self.ends[s:e].tolist(),
                        self.widths[s:e].tolist()))


def _build(doc: np.ndarray, starts: np.ndarray, ends: np.ndarray,
           widths: np.ndarray, n: int) -> BatchSpans:
    """CSR from unsorted (doc, start, end, width) tuples."""
    order = np.lexsort((widths, ends, starts, doc))
    doc = doc[order]
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(doc, minlength=n), out=offsets[1:])
    return BatchSpans(starts[order], ends[order], widths[order], offsets)


def _empty(n: int) -> BatchSpans:
    return BatchSpans(_E, _E, _E, np.zeros(n + 1, dtype=np.int64))


def empty(n: int) -> BatchSpans:
    """All-docs-empty span set (absent term / no match anywhere)."""
    return _empty(n)


def from_positions(plists: list, n: int) -> BatchSpans:
    """Term spans (p, p+1, 0) (TermSpans.java:110) from per-doc sorted
    position arrays (None/empty = term absent)."""
    arrs = [p for p in plists if p is not None and len(p)]
    if not arrs:
        return _empty(n)
    counts = np.array(
        [0 if p is None else len(p) for p in plists], dtype=np.int64
    )
    starts = np.concatenate(arrs).astype(np.int64, copy=False)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return BatchSpans(
        starts, starts + 1, np.zeros(starts.size, dtype=np.int64), offsets
    )


def or_merge(subs: list[BatchSpans], n: int) -> BatchSpans:
    """SpanOrQuery: per-doc merge in (start, end) order
    (SpanOrQuery.java / spans.py or_spans)."""
    subs = [s for s in subs if s.starts.size]
    if not subs:
        return _empty(n)
    if len(subs) == 1:
        return subs[0]
    doc = np.concatenate([s.doc_ids() for s in subs])
    starts = np.concatenate([s.starts for s in subs])
    ends = np.concatenate([s.ends for s in subs])
    widths = np.concatenate([s.widths for s in subs])
    return _build(doc, starts, ends, widths, n)


def _keyed(bs: BatchSpans) -> np.ndarray:
    """(doc << 32) | start keys for per-doc searchsorted."""
    return (bs.doc_ids() << 32) | bs.starts


def near_ordered(subs: list[BatchSpans], slop: int, n: int) -> BatchSpans:
    """NearSpansOrdered over all docs (spans.py near_ordered, batch):
    round k enumerates the k-th clause-0 span of every still-live doc;
    later-clause pointers persist across rounds exactly like the
    reference's subSpans (exhaustion of any pointer kills the doc)."""
    m = len(subs)
    counts = [s.counts() for s in subs]
    c0 = counts[0]
    dead = np.zeros(n, dtype=bool)
    for c in counts:
        dead |= c == 0
    keys = [_keyed(s) for s in subs]
    idx = np.zeros((n, m), dtype=np.int64)
    out_d, out_s, out_e, out_w = [], [], [], []
    max_k = int(c0.max(initial=0))
    for k in range(max_k):
        ad = np.flatnonzero(~dead & (k < c0))
        if ad.size == 0:
            break
        p0 = subs[0].offsets[ad] + k
        mstart = subs[0].starts[p0]
        pend = subs[0].ends[p0]
        width = np.zeros(ad.size, dtype=np.int64)
        ok = np.ones(ad.size, dtype=bool)
        for i in range(1, m):
            base = subs[i].offsets[ad]
            j = np.searchsorted(keys[i], (ad << 32) | pend)
            j_rel = np.maximum(idx[ad, i], j - base)
            exhausted = ok & (j_rel >= counts[i][ad])
            dead[ad[exhausted]] = True
            ok &= ~exhausted
            g = base + np.minimum(j_rel, np.maximum(counts[i][ad] - 1, 0))
            width = np.where(ok, width + subs[i].starts[g] - pend, width)
            pend = np.where(ok, subs[i].ends[g], pend)
            idx[ad, i] = np.where(ok, j_rel, idx[ad, i])
        match = ok & (width <= slop)
        if match.any():
            out_d.append(ad[match])
            out_s.append(mstart[match])
            out_e.append(pend[match])
            out_w.append(width[match])
    if not out_d:
        return _empty(n)
    return _build(np.concatenate(out_d), np.concatenate(out_s),
                  np.concatenate(out_e), np.concatenate(out_w), n)


def near_unordered(subs: list[BatchSpans], slop: int, n: int) -> BatchSpans:
    """NearSpansUnordered over all docs (spans.py near_unordered, batch):
    each round performs one queue transition per live doc — record the
    state if it matches (maxEnd - minStart - totalLength <= slop), then
    advance the (start, end, cell)-least cell; scoring width is
    maxEndCell.start - minCell.start (NearSpansUnordered.java:257-259)."""
    m = len(subs)
    counts = np.stack([s.counts() for s in subs], axis=1)  # (n, m)
    alive = ~(counts == 0).any(axis=1)
    if not alive.any():
        return _empty(n)
    idx = np.zeros((n, m), dtype=np.int64)
    cur_s = np.zeros((n, m), dtype=np.int64)
    cur_e = np.zeros((n, m), dtype=np.int64)
    offs = np.stack([s.offsets[:-1] for s in subs], axis=1)  # (n, m)
    av = np.flatnonzero(alive)
    for i in range(m):
        g = offs[av, i]
        cur_s[av, i] = subs[i].starts[g]
        cur_e[av, i] = subs[i].ends[g]
    total_len = np.where(alive, (cur_e - cur_s).sum(axis=1), 0)
    # maxEndPositionCell: first cell achieving the running max end
    # (adjustMax uses strict >, so ties keep the earliest — argmax)
    max_i = np.argmax(cur_e, axis=1)
    out_d, out_s, out_e, out_w = [], [], [], []
    big = np.int64(1) << 62
    while av.size:
        s_a = cur_s[av]
        e_a = cur_e[av]
        # PhraseQueue min by (start, end, cell): masked argmin chain
        smin = s_a.min(axis=1)
        m1 = s_a == smin[:, None]
        emin = np.where(m1, e_a, big).min(axis=1)
        cell = np.argmax(m1 & (e_a == emin[:, None]), axis=1)
        me = cur_e[av, max_i[av]]
        ms = cur_s[av, max_i[av]]
        match = me - smin - total_len[av] <= slop
        if match.any():
            out_d.append(av[match])
            out_s.append(smin[match])
            out_e.append(me[match])
            out_w.append((ms - smin)[match])
        # advance the min cell
        nidx = idx[av, cell] + 1
        dead = nidx >= counts[av, cell]
        keep = ~dead
        avk, cellk, nk = av[keep], cell[keep], nidx[keep]
        idx[avk, cellk] = nk
        ns = np.empty(avk.size, dtype=np.int64)
        ne = np.empty(avk.size, dtype=np.int64)
        for i in range(m):
            sel = cellk == i
            if sel.any():
                g = offs[avk[sel], i] + nk[sel]
                ns[sel] = subs[i].starts[g]
                ne[sel] = subs[i].ends[g]
        total_len[avk] += (ne - ns) - (
            cur_e[avk, cellk] - cur_s[avk, cellk]
        )
        cur_s[avk, cellk] = ns
        cur_e[avk, cellk] = ne
        upd = ne > cur_e[avk, max_i[avk]]
        max_i[avk[upd]] = cellk[upd]
        av = avk
    if not out_d:
        return _empty(n)
    return _build(np.concatenate(out_d), np.concatenate(out_s),
                  np.concatenate(out_e), np.concatenate(out_w), n)


def filter_end_le(bs: BatchSpans, limit: int) -> BatchSpans:
    """SpanFirstQuery: spans with endPosition() <= limit."""
    keep = bs.ends <= limit
    return _subset(bs, keep)


def position_range(bs: BatchSpans, start: int, end: int) -> BatchSpans:
    """SpanPositionRangeQuery acceptPosition
    (SpanPositionRangeQuery.java:30-37): start <= span.start and
    span.end <= end (the early NO_MORE_IN_CURRENT_DOC exit only skips
    spans the filter rejects anyway, since end > start for every span)."""
    keep = (bs.starts >= start) & (bs.ends <= end)
    return _subset(bs, keep)


def _subset(bs: BatchSpans, keep: np.ndarray) -> BatchSpans:
    if keep.all():
        return bs
    doc = bs.doc_ids()[keep]
    n = bs.n_docs
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(doc, minlength=n), out=offsets[1:])
    return BatchSpans(
        bs.starts[keep], bs.ends[keep], bs.widths[keep], offsets
    )


def span_not(inc: BatchSpans, exc: BatchSpans, pre: int, post: int
             ) -> BatchSpans:
    """SpanNotQuery (SpanNotQuery.java:169-186): drop an include span
    when any exclude span intersects [start - pre, end + post).  Batch:
    an exclude span e intersects c iff e.start < c.end + post and
    e.end > c.start - pre; with excludes sorted by start, the candidates
    are a per-doc prefix (searchsorted on c.end + post) and the test is
    prefix-max(exclude ends) > c.start - pre."""
    if inc.starts.size == 0 or exc.starts.size == 0:
        return inc
    exc_doc = exc.doc_ids()
    # per-doc running max of exclude ends: global cummax over
    # doc-offset-shifted values (doc << 32 dominates any position)
    shifted = (exc_doc << 32) + exc.ends
    cummax = np.maximum.accumulate(shifted) - (exc_doc << 32)
    exc_keys = (exc_doc << 32) | exc.starts
    inc_doc = inc.doc_ids()
    j = np.searchsorted(exc_keys, (inc_doc << 32) | (inc.ends + post))
    base = exc.offsets[inc_doc]
    has_prefix = j > base
    jm1 = np.maximum(j - 1, 0)
    reject = has_prefix & (cummax[jm1] > inc.starts - pre)
    return _subset(inc, ~reject)


def containing(big: BatchSpans, little: BatchSpans) -> BatchSpans:
    """SpanContainingQuery (spans.py containing_spans, batch): round k
    visits the k-th big span of every doc; the little pointer (monotone,
    over sorted starts) is max(pointer, searchsorted(little.start,
    big.start)); emit the big span when little[li].end <= big.end."""
    n = big.n_docs
    if big.starts.size == 0 or little.starts.size == 0:
        return _empty(n)
    cb = big.counts()
    cl = little.counts()
    lkeys = (little.doc_ids() << 32) | little.starts
    li = np.zeros(n, dtype=np.int64)
    out_d, out_s, out_e, out_w = [], [], [], []
    for k in range(int(cb.max(initial=0))):
        ad = np.flatnonzero((k < cb) & (cl > 0))
        if ad.size == 0:
            break
        g = big.offsets[ad] + k
        bstart, bend = big.starts[g], big.ends[g]
        j = np.searchsorted(lkeys, (ad << 32) | bstart)
        j_rel = np.maximum(li[ad], j - little.offsets[ad])
        li[ad] = j_rel
        ok = j_rel < cl[ad]
        lg = little.offsets[ad] + np.minimum(
            j_rel, np.maximum(cl[ad] - 1, 0)
        )
        emit = ok & (bend >= little.ends[lg])
        if emit.any():
            out_d.append(ad[emit])
            out_s.append(bstart[emit])
            out_e.append(bend[emit])
            out_w.append(big.widths[g][emit])
    if not out_d:
        return _empty(n)
    return _build(np.concatenate(out_d), np.concatenate(out_s),
                  np.concatenate(out_e), np.concatenate(out_w), n)


def within(big: BatchSpans, little: BatchSpans) -> BatchSpans:
    """SpanWithinQuery (spans.py within_spans, batch): the big pointer
    advances on span ENDS, which are not sorted within a doc, so each
    round performs exactly one two-pointer step per live doc: either
    advance big (big.end < little.end) or test-emit-and-advance
    little."""
    n = big.n_docs
    if big.starts.size == 0 or little.starts.size == 0:
        return _empty(n)
    cb = big.counts()
    cl = little.counts()
    li = np.zeros(n, dtype=np.int64)
    bi = np.zeros(n, dtype=np.int64)
    out_d, out_s, out_e, out_w = [], [], [], []
    av = np.flatnonzero((cb > 0) & (cl > 0))
    while av.size:
        lg = little.offsets[av] + li[av]
        bg = big.offsets[av] + bi[av]
        adv_big = big.ends[bg] < little.ends[lg]
        emit = ~adv_big & (big.starts[bg] <= little.starts[lg])
        if emit.any():
            out_d.append(av[emit])
            out_s.append(little.starts[lg][emit])
            out_e.append(little.ends[lg][emit])
            out_w.append(little.widths[lg][emit])
        bi[av] += adv_big
        li[av] += ~adv_big
        av = av[np.where(adv_big, bi[av] < cb[av], li[av] < cl[av])]
    if not out_d:
        return _empty(n)
    return _build(np.concatenate(out_d), np.concatenate(out_s),
                  np.concatenate(out_e), np.concatenate(out_w), n)


def batch_doc_spans(node, n: int, term_batch) -> BatchSpans:
    """Evaluate a span clause tree (spans.py doc_spans grammar) over all
    n docs at once.  `term_batch(term) -> BatchSpans` supplies term
    spans (absent terms = empty)."""
    kind = node[0]
    if kind == "sterm":
        return term_batch(node[1])
    if kind == "sor":
        return or_merge([term_batch(t) for t in node[1]], n)
    if kind == "span_near":
        subs = [batch_doc_spans(c, n, term_batch) for c in node[1]]
        fn = near_ordered if node[3] else near_unordered
        return fn(subs, node[2], n)
    if kind == "span_first":
        return filter_end_le(batch_doc_spans(node[1], n, term_batch),
                             node[2])
    if kind == "span_not":
        inc = batch_doc_spans(node[1], n, term_batch)
        exc = batch_doc_spans(node[2], n, term_batch)
        pre = node[3] if len(node) > 3 else 0
        post = node[4] if len(node) > 4 else 0
        return span_not(inc, exc, pre, post)
    if kind == "span_containing":
        return containing(batch_doc_spans(node[1], n, term_batch),
                          batch_doc_spans(node[2], n, term_batch))
    if kind == "span_within":
        return within(batch_doc_spans(node[1], n, term_batch),
                      batch_doc_spans(node[2], n, term_batch))
    if kind == "span_range":
        return position_range(batch_doc_spans(node[1], n, term_batch),
                              node[2], node[3])
    raise ValueError(f"not a span clause: {kind}")


def batch_span_freqs(bs: BatchSpans) -> np.ndarray:
    """float32[n] per-doc freq = sequential float32 sum of 1/(1+width)
    in (start, end, width) order — bit-identical to span_freq over the
    sorted doc_spans list (per-rank vectorized rounds reproduce the
    sequential accumulation exactly)."""
    n = bs.n_docs
    freqs = np.zeros(n, dtype=np.float32)
    if bs.starts.size == 0:
        return freqs
    doc = bs.doc_ids()
    factors = (
        np.float32(1.0)
        / (bs.widths.astype(np.float32) + np.float32(1.0))
    ).astype(np.float32)
    rank = np.arange(doc.size, dtype=np.int64) - np.repeat(
        bs.offsets[:-1], bs.counts()
    )
    for r in range(int(rank.max()) + 1):
        sel = rank == r
        freqs[doc[sel]] = (freqs[doc[sel]] + factors[sel]).astype(
            np.float32
        )
    return freqs
