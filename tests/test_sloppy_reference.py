"""Independent freq-level cross-check of `query/sloppy.py`.

ADVICE r3 item 3: every production parity test (engine / oracle /
distributed) shares the one `sloppy_freq` implementation, and the
randomized repeat-phrase test checks membership only — so a freq-level
deviation from the reference's enumeration would slip through.  This
module keeps a DIRECT, test-only transliteration of the reference's
sloppy-phrase machinery and compares float32 freq values:

- `_RefPQ`       — util/PriorityQueue.java:137-189,259-289 (exact 1-based
                   binary heap: add/upHeap, pop/downHeap, top), with
                   PhraseQueue.java:27-40's lessThan.
- `_RefPP`       — search/PhrasePositions.java:27-77.
- `ref_phrase_freq` — search/SloppyPhraseScorer.java phraseFreq() +
                   initFirstTime/gatherRptGroups (non-multi-term branch) /
                   sortRptGroups / advanceRepeatGroups / fillQueue /
                   advancePP / advanceRpts / collide / lesser / tpPos,
                   line-by-line including the bitset re-queue procedure
                   (SloppyPhraseScorer.java:147-186) and its quirk of
                   testing `rptInd` without checking the repeat GROUP.

This transliteration exists ONLY as a test oracle; production code is
`lucene_solr_spark/query/sloppy.py` (a lazy-deletion-heap restatement).
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from lucene_solr_spark.query.sloppy import repeat_groups, sloppy_freq


class _RefPP:
    """PhrasePositions.java over an in-memory raw-position list."""

    def __init__(self, raw_positions: list[int], offset: int, ord_: int):
        self._raw = raw_positions
        self.offset = offset
        self.ord = ord_
        self.position = 0
        self.count = 0
        self._i = 0
        self.rptGroup = -1
        self.rptInd = 0

    def firstPosition(self) -> None:
        self.count = len(self._raw)
        self._i = 0
        self.nextPosition()

    def nextPosition(self) -> bool:
        if self.count > 0:
            self.count -= 1
            self.position = self._raw[self._i] - self.offset
            self._i += 1
            return True
        return False


def _less_than(pp1: _RefPP, pp2: _RefPP) -> bool:
    # PhraseQueue.java:27-40
    if pp1.position == pp2.position:
        if pp1.offset == pp2.offset:
            return pp1.ord < pp2.ord
        return pp1.offset < pp2.offset
    return pp1.position < pp2.position


class _RefPQ:
    """util/PriorityQueue.java — exact transliteration (1-based array,
    upHeap on add, downHeap on pop) so that heap-invariant-violating
    states (mutated elements) pop in exactly the reference's order."""

    def __init__(self, max_size: int):
        self.heap: list[_RefPP | None] = [None] * (max_size + 1)
        self.size = 0

    def add(self, element: _RefPP) -> None:
        self.size += 1
        self.heap[self.size] = element
        self._up_heap(self.size)

    def top(self) -> _RefPP:
        return self.heap[1]

    def pop(self) -> _RefPP | None:
        if self.size > 0:
            result = self.heap[1]
            self.heap[1] = self.heap[self.size]
            self.heap[self.size] = None
            self.size -= 1
            self._down_heap(1)
            return result
        return None

    def clear(self) -> None:
        for i in range(len(self.heap)):
            self.heap[i] = None
        self.size = 0

    def _up_heap(self, orig: int) -> None:
        i = orig
        node = self.heap[i]
        j = i >> 1
        while j > 0 and _less_than(node, self.heap[j]):
            self.heap[i] = self.heap[j]
            i = j
            j >>= 1
        self.heap[i] = node

    def _down_heap(self, i: int) -> None:
        node = self.heap[i]
        j = i << 1
        k = j + 1
        if k <= self.size and _less_than(self.heap[k], self.heap[j]):
            j = k
        while j <= self.size and _less_than(self.heap[j], node):
            self.heap[i] = self.heap[j]
            i = j
            j = i << 1
            k = j + 1
            if k <= self.size and _less_than(self.heap[k], self.heap[j]):
                j = k
        self.heap[i] = node


def ref_phrase_freq(terms: list[str], doc: list[str], slop: int) -> np.float32:
    """SloppyPhraseScorer.phraseFreq() for ONE candidate doc, first-time
    init path (initFirstTime), single-term clauses (no multi-term
    repeats).  `terms[i]` is the clause at phrase offset i; `doc` the
    token stream.  Returns 0.0 when some clause term is absent."""
    positions: dict[str, list[int]] = {}
    for p, tok in enumerate(doc):
        positions.setdefault(tok, []).append(p)
    if any(t not in positions for t in terms):
        return np.float32(0.0)

    pps = [_RefPP(positions[t], off, i) for i, (off, t) in
           enumerate(zip(range(len(terms)), terms))]
    pq = _RefPQ(len(pps))
    end = -(1 << 60)
    rpt_groups: list[list[_RefPP]] = []

    def tpPos(pp: _RefPP) -> int:
        return pp.position + pp.offset

    def advancePP(pp: _RefPP) -> bool:
        nonlocal end
        if not pp.nextPosition():
            return False
        if pp.position > end:
            end = pp.position
        return True

    def lesser(pp: _RefPP, pp2: _RefPP) -> _RefPP:
        if pp.position < pp2.position or (
                pp.position == pp2.position and pp.offset < pp2.offset):
            return pp
        return pp2

    def collide(pp: _RefPP) -> int:
        tp = tpPos(pp)
        rg = rpt_groups[pp.rptGroup]
        for pp2 in rg:
            if pp2 is not pp and tpPos(pp2) == tp:
                return pp2.rptInd
        return -1

    # ---- initFirstTime (SloppyPhraseScorer.java:322-341) ----
    for pp in pps:
        pp.firstPosition()
    term_counts: dict[str, int] = {}
    for t in terms:
        term_counts[t] = term_counts.get(t, 0) + 1
    rpt_terms = {t for t, c in term_counts.items() if c >= 2}
    has_rpts = bool(rpt_terms)
    if has_rpts:
        # gatherRptGroups, non-multi-term branch (java:380-407):
        # grouping is by tpPos collision at the FIRST doc positions.
        rpp = [pp for i, pp in enumerate(pps) if terms[i] in rpt_terms]
        groups: list[list[_RefPP]] = []
        for i, pp in enumerate(rpp):
            if pp.rptGroup >= 0:
                continue
            tp = tpPos(pp)
            for pp2 in rpp[i + 1:]:
                if (pp2.rptGroup >= 0 or pp2.offset == pp.offset
                        or tpPos(pp2) != tp):
                    continue
                g = pp.rptGroup
                if g < 0:
                    g = len(groups)
                    pp.rptGroup = g
                    groups.append([pp])
                pp2.rptGroup = g
                groups[g].append(pp2)
        # sortRptGroups (java:360-377): by query offset; rptInd = index
        for g_members in groups:
            g_members.sort(key=lambda p: p.offset)
            for j, pp in enumerate(g_members):
                pp.rptInd = j
        rpt_groups = groups
        # advanceRepeatGroups, non-MTP branch (java:288-318)
        for rg in rpt_groups:
            for j in range(1, len(rg)):
                for _ in range(j):
                    if not rg[j].nextPosition():
                        return np.float32(0.0)
    # fillQueue (java:269-277)
    pq.clear()
    for pp in pps:
        if pp.position > end:
            end = pp.position
        pq.add(pp)

    def advanceRpts(pp: _RefPP) -> bool:
        # SloppyPhraseScorer.java:147-186 — including the rptStack /
        # FixedBitSet re-queue and its group-agnostic rptInd test
        if pp.rptGroup < 0:
            return True
        rg = rpt_groups[pp.rptGroup]
        bits: set[int] = set()
        k0 = pp.rptInd
        while (k := collide(pp)) >= 0:
            pp = lesser(pp, rg[k])
            if not advancePP(pp):
                return False
            if k != k0:
                bits.add(k)
        rpt_stack: list[_RefPP] = []
        while bits:
            pp2 = pq.pop()
            rpt_stack.append(pp2)
            if pp2.rptGroup >= 0 and pp2.rptInd in bits:
                bits.discard(pp2.rptInd)
        for pp2 in reversed(rpt_stack):
            pq.add(pp2)
        return True

    # ---- phraseFreq main loop (java:98-130) ----
    freq = np.float32(0.0)
    pp = pq.pop()
    match_length = end - pp.position
    nxt = pq.top().position
    while advancePP(pp):
        if has_rpts and not advanceRpts(pp):
            break
        if pp.position > nxt:
            if match_length <= slop:
                freq = np.float32(
                    freq + np.float32(1.0) / np.float32(match_length + 1))
            pq.add(pp)
            pp = pq.pop()
            nxt = pq.top().position
            match_length = end - pp.position
        else:
            ml2 = end - pp.position
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        freq = np.float32(
            freq + np.float32(1.0) / np.float32(match_length + 1))
    return freq


def _impl_freq(terms: list[str], doc: list[str], slop: int) -> np.float32:
    positions: dict[str, list[int]] = {}
    for p, tok in enumerate(doc):
        positions.setdefault(tok, []).append(p)
    if any(t not in positions for t in terms):
        return np.float32(0.0)
    adjusted = [np.asarray(positions[t], dtype=np.int64) - off
                for off, t in enumerate(terms)]
    offsets = list(range(len(terms)))
    return sloppy_freq(adjusted, offsets, slop, repeat_groups(terms))


HAND_CASES = [
    # (phrase, doc, slop) — collision-heavy repeat patterns
    (["a", "b"], ["x", "a", "b", "a", "y"], 2),        # javadoc example
    (["a", "b", "a"], ["a", "b", "a"], 0),
    (["a", "b", "a"], ["a", "b", "a", "b", "a"], 2),
    (["a", "a"], ["a", "a", "a", "a"], 3),
    (["a", "a", "b"], ["a", "a", "b", "a", "b"], 2),
    (["a", "b", "a", "b"], ["a", "b", "a", "b", "a", "b"], 4),  # 2 groups
    (["a", "b", "b", "a"], ["b", "a", "a", "b", "b", "a"], 3),  # 2 groups
    (["c", "a", "c", "a"], ["a", "c", "a", "c", "c", "a", "a"], 5),
    (["a", "b", "c"], ["c", "b", "a", "b", "c"], 4),
    (["a", "a", "a"], ["a"] * 9, 6),
]


@pytest.mark.parametrize("phrase,doc,slop", HAND_CASES)
def test_freq_matches_reference_hand_cases(phrase, doc, slop):
    got = _impl_freq(phrase, doc, slop)
    want = ref_phrase_freq(phrase, doc, slop)
    assert got == want, (phrase, doc, slop, float(got), float(want))


def test_freq_matches_reference_randomized():
    """1500 random collision-heavy cases: tiny alphabets force repeated
    terms to stack on the same positions constantly, driving the
    advanceRpts collision/re-queue machinery hard; freq values (not just
    membership) must be bit-identical float32."""
    rng = random.Random(0x5107)
    alphabet = ["a", "b", "c"]
    checked = 0
    nonzero = 0
    for _ in range(1500):
        nterms = rng.randint(2, 5)
        phrase = [rng.choice(alphabet[: rng.randint(1, 3)])
                  for _ in range(nterms)]
        doclen = rng.randint(nterms, 24)
        doc = [rng.choice(alphabet[: rng.randint(1, 3)])
               for _ in range(doclen)]
        slop = rng.randint(0, 6)
        got = _impl_freq(phrase, doc, slop)
        want = ref_phrase_freq(phrase, doc, slop)
        assert got == want, (phrase, doc, slop, float(got), float(want))
        checked += 1
        if want > 0:
            nonzero += 1
    assert checked == 1500 and nonzero > 300  # the sweep actually matched


def test_repeat_group_structure_matches_first_doc_gathering():
    """repeat_groups(terms) (doc-independent, single-term clauses) must
    equal the reference's first-doc tpPos gathering for any doc that
    contains all terms — same groups, same offset order."""
    rng = random.Random(7)
    for _ in range(300):
        nterms = rng.randint(2, 6)
        phrase = [rng.choice("ab") for _ in range(nterms)]
        doc = [rng.choice("ab") for _ in range(rng.randint(nterms, 16))]
        positions: dict[str, list[int]] = {}
        for p, tok in enumerate(doc):
            positions.setdefault(tok, []).append(p)
        if any(t not in positions for t in phrase):
            continue
        pps = [_RefPP(positions[t], off, i)
               for i, (off, t) in enumerate(zip(range(nterms), phrase))]
        for pp in pps:
            pp.firstPosition()
        term_counts: dict[str, int] = {}
        for t in phrase:
            term_counts[t] = term_counts.get(t, 0) + 1
        rpt_terms = {t for t, c in term_counts.items() if c >= 2}
        rpp = [pp for i, pp in enumerate(pps) if phrase[i] in rpt_terms]
        ref_groups: list[list[int]] = []
        marked: dict[int, int] = {}
        for i, pp in enumerate(rpp):
            if pp.ord in marked:
                continue
            tp = pp.position + pp.offset
            for pp2 in rpp[i + 1:]:
                if (pp2.ord in marked or pp2.offset == pp.offset
                        or pp2.position + pp2.offset != tp):
                    continue
                if pp.ord not in marked:
                    marked[pp.ord] = len(ref_groups)
                    ref_groups.append([pp.ord])
                marked[pp2.ord] = marked[pp.ord]
                ref_groups[marked[pp.ord]].append(pp2.ord)
        got = sorted(tuple(g) for g in repeat_groups(phrase))
        want = sorted(tuple(sorted(g)) for g in ref_groups)
        assert got == want, (phrase, doc, got, want)
