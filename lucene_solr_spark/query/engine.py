"""Local (single-process) query executor over a built index — the
shard-server analogue of IndexSearcher.search (SURVEY.md §3.2).

Reads the parquet index directly through pyarrow with bucket partition
pruning + term predicate pushdown, decodes posting blocks with the numpy
codec, and scores BM25 with exactly Lucene's float discipline:

- per-term float32 scores via the 256-entry norm cache
  (BM25Similarity.java:213-217, 229-254),
- boolean nodes sum child scores in double, cast to float32
  (DisjunctionSumScorer.java:36-41, ConjunctionScorer.java:54-58),
- top-k tie-break (score desc, docID asc) (HitQueue.java:76-81).

Physical optimizations (SURVEY.md §4.2):
- AND: cost-ordered intersection, cheapest (lowest-df) list leads
  (ConjunctionDISI.java:150,175-210); larger lists decode only blocks
  whose [first_doc, last_doc] range intersects surviving candidates —
  the skip-list advance() analogue over our block-max metadata.
- top-level OR with k: sound block-max pruning (the reference 7.0
  snapshot has no WAND; this is our addition per the north star):
  block b of term t is skipped when
      block_ub(t, b) + sum(global_max(t') for t' != t) < theta
  with block_ub derived from the stored (max_tf, min_ntab) metadata and
  the CURRENT global avgdl (sound under NRT segment appends)
  where theta is the k-th best fully-scored candidate so far.  Skipped
  blocks are decoded on demand if one of their docs survives via another
  term, so returned scores are always complete and exact.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.dataset as pads

from ..index.builder import term_bucket
from ..index.codec import decode_block
from ..oracle.smallfloat import NORM_TABLE
from .parser import parse_query


class _TermPostings:
    """Decoded-on-demand posting list of one term: sorted docs, tfs, norms,
    plus per-block metadata for range skipping."""

    __slots__ = ("term", "n_docs", "ttf", "blocks", "_decoded", "_full")

    def __init__(self, term: str, block_rows: list[dict]):
        self.term = term
        # segments are docBase-ordered and salts doc-range ordered within
        # a segment -> (seg, salt, block_id) order is global doc order;
        # block ranges are disjoint and ascending.
        self.blocks = sorted(
            block_rows,
            key=lambda r: (r.get("seg", 0), r["salt"], r["block_id"]),
        )
        self.n_docs = sum(b["doc_count"] for b in self.blocks)
        #: collection totalTermFreq, rolled up from block metadata
        self.ttf = sum(int(b.get("sum_tf") or 0) for b in self.blocks)
        self._decoded: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        self._full: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None

    def block_ranges(self) -> tuple[np.ndarray, np.ndarray]:
        fd = np.array([b["first_doc"] for b in self.blocks], dtype=np.int64)
        ld = np.array([b["last_doc"] for b in self.blocks], dtype=np.int64)
        return fd, ld

    def decode(self, idx: int):
        got = self._decoded.get(idx)
        if got is None:
            b = self.blocks[idx]
            docs, tfs = decode_block(b)
            norms = np.frombuffer(b["norms_payload"], dtype=np.uint8)
            got = (docs, tfs, norms)
            self._decoded[idx] = got
        return got

    def decode_positions_blocks(self, idxs):
        """(docs, tfs, norms, positions list-per-posting) for the given
        block indexes only — phrase evaluation decodes positions just for
        blocks whose doc range intersects the surviving candidates;
        requires an index built with BuildConfig(positions=True)."""
        from ..index.codec import decode_positions

        docs, tfs, norms = self.decode_blocks(idxs)
        pos: list[np.ndarray] = []
        for i in idxs:
            b = self.blocks[i]
            if b.get("pos_payload") is None:
                raise ValueError(
                    f"term {self.term!r}: index has no positions "
                    "(build with BuildConfig(positions=True) for phrase queries)"
                )
            pos.extend(decode_positions(b["pos_payload"], self.decode(i)[1]))
        return docs, tfs, norms, pos

    def decode_positions_all(self):
        return self.decode_positions_blocks(list(range(len(self.blocks))))

    def decode_blocks(self, idxs) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        if len(idxs) == 0:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.uint8),
            )
        if len(idxs) == len(self.blocks):
            return self.decode_all()  # cached concatenation
        parts = [self.decode(i) for i in idxs]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]),
        )

    def decode_all(self):
        if self._full is None:
            # batch-decode the not-yet-cached full (kind-0) blocks in
            # one vectorized pass — the first touch of a hot term costs
            # a few unpackbits/cumsum passes instead of ~10^3 python
            # block loops (cold-path p95; codec.decode_full_blocks_batch
            # is bit-identical to per-block decode)
            todo = [i for i, b in enumerate(self.blocks)
                    if b["kind"] == 0 and i not in self._decoded]
            if len(todo) > 1:
                from ..index.codec import BLOCK_SIZE, decode_full_blocks_batch

                docs, tfs = decode_full_blocks_batch(
                    [self.blocks[i] for i in todo]
                )
                for j, i in enumerate(todo):
                    sl = slice(j * BLOCK_SIZE, (j + 1) * BLOCK_SIZE)
                    self._decoded[i] = (
                        docs[sl], tfs[sl],
                        np.frombuffer(self.blocks[i]["norms_payload"],
                                      dtype=np.uint8),
                    )
            parts = [self.decode(i) for i in range(len(self.blocks))]
            if not parts:
                return (
                    np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.uint8),
                )
            self._full = (
                np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]),
                np.concatenate([p[2] for p in parts]),
            )
        return self._full


class LocalSearcher:
    """Serve top-k boolean queries from a built index directory.

    `similarity` picks the scoring model at query time (both decode the
    same floatToByte315 norm byte, so no reindex is needed — exactly the
    reference's IndexSearcher.setSimilarity):
    - "bm25" (default): BM25Similarity, parameterized k1/b;
    - "classic": ClassicSimilarity (TF-IDF) —
      score = sqrt(freq) * idf * byte315ToFloat(norm) with
      idf = ln((docCount+1)/(docFreq+1)) + 1
      (similarities/ClassicSimilarity.java:50-79,
      TFIDFSimilarity.java:98-110 raw = tf(freq)*weight, then * norm);
    - "lmd": LMDirichletSimilarity (Bayesian Dirichlet smoothing,
      similarities/LMDirichletSimilarity.java:66-71) — per-term
      score = max(0, ln(1 + freq/(mu*pc)) + ln(mu/(docLen+mu))) with
      pc = (totalTermFreq+1)/(sumTotalTermFreq+1) float32
      (LMSimilarity.DefaultCollectionModel) and docLen decoded from the
      SimilarityBase norm byte (1/(f*f)); multi-term weights sum the
      per-term scores at the shared freq
      (MultiSimilarity.MultiSimScorer).  LMD scores can be exactly 0
      for a matching doc, so the score-nonzero-derived dense/pruned
      fast paths are bypassed (the exhaustive evaluator is always
      used) — correct, not the perf headline;
    - "lmjm": LMJelinekMercerSimilarity (lambda mixing,
      LMJelinekMercerSimilarity.java:54-59);
    - "dfr" / "ib" / "dfi" / "ax" / "bool": the SimilarityBase family
      round 4 added — DFR I(n)L2, IB LL-D2, DFI(ChiSquared),
      AxiomaticF2EXP, BooleanSimilarity; formulas, float discipline,
      and reference citations in query/similarities.py.  Like lmd they
      run the exhaustive evaluator (see _fastpaths).
    """

    def __init__(self, index_dir: str, pruning: bool = True,
                 similarity: str = "bm25", mu: float = 2000.0,
                 lmjm_lambda: float = 0.1,
                 dense_budget_mb: int | None = None):
        from .similarities import SIMBASE

        assert similarity in ("bm25", "classic", "lmd", "lmjm") + SIMBASE
        self.index_dir = index_dir
        self.pruning = pruning
        self.similarity = similarity
        self.mu = float(mu)
        self.lmjm_lambda = float(lmjm_lambda)
        # warm-path memory budget -> dense structure bounds (SCALE.md
        # "Warm-path memory budget"): maxDoc cap at 16 B/doc, and at
        # most half the budget for the hot-term table cache (5 B/doc
        # per cached term: float32 table + derived bool mask)
        if dense_budget_mb is None:
            dense_budget_mb = int(os.environ.get(
                "LSS_DENSE_BUDGET_MB", self._DENSE_BUDGET_MB_DEFAULT
            ))
        self.dense_budget_bytes = dense_budget_mb << 20
        self._DENSE_MAX_DOC = max(1, self.dense_budget_bytes // 16)
        #: fast paths (block-max pruning, dense tables, TA, topcand)
        #: assume score > 0 for every present posting AND a scalar
        #: per-term weight with a block upper-bound formula — true for
        #: bm25/classic/lmjm; lmd and dfi can score a present posting
        #: exactly 0, and the SimilarityBase family (dfr/ib/dfi/ax/
        #: bool, similarities.py) carries tuple weights, so all of
        #: those take the exhaustive evaluator (correct, not the
        #: serving-latency headline)
        self._fastpaths = similarity in ("bm25", "classic", "lmjm")
        with open(os.path.join(index_dir, "_manifest.json")) as f:
            m = json.load(f)
        self.params = m["params"]
        self.n_buckets = int(self.params["n_buckets"])
        from ..analysis.analyzer import AnalyzerOptions

        #: the index's recorded analyzer chain — query atoms analyze
        #: through the SAME chain (QueryParser field-analyzer rule)
        self.analyzer_opts = AnalyzerOptions.from_manifest(
            self.params.get("analyzer")
        )
        self.k1 = np.float32(self.params.get("k1", 1.2))
        self.b = np.float32(self.params.get("b", 0.75))
        from ..index.builder import read_all_field_stats

        self.fstats = read_all_field_stats(index_dir)
        fs = self.fstats.get(
            "text", {"doc_count": 0, "sum_total_term_freq": 0, "max_doc": 0}
        )
        self.doc_count = int(fs["doc_count"] or 0)
        self.sum_ttf = int(fs["sum_total_term_freq"] or 0)
        self.max_doc = int(fs["max_doc"] or 0)
        self.avgdl = (
            np.float32(self.sum_ttf / float(self.doc_count))
            if self.sum_ttf > 0
            else np.float32(1.0)
        )
        self.cache = (
            self.k1
            * ((np.float32(1.0) - self.b) + self.b * NORM_TABLE / self.avgdl)
        ).astype(np.float32)
        self._postings_ds = pads.dataset(
            os.path.join(index_dir, "postings"), format="parquet",
            partitioning="hive",
        )
        #: decoded posting lists keyed (field, term)
        self._term_cache: dict[tuple[str, str], _TermPostings] = {}
        from ..index.deletes import read_deleted

        #: tombstoned docIDs, masked at collection like liveDocs (scores
        #: and stats unchanged until compaction — the reference's
        #: pre-merge delete semantics)
        self._deleted = read_deleted(index_dir)

    # ------------------------------------------------------------ fetch
    def _tp(self, term: str, field: str = "text") -> _TermPostings:
        return self._term_cache[(field, term)]

    def _load_terms(self, pairs: list[tuple[str, str]]) -> None:
        """Fetch posting blocks for (field, term) pairs not yet cached —
        ONE bucket-pruned, predicate-pushed scan for all of them."""
        missing = [p for p in set(pairs) if p not in self._term_cache]
        if not missing:
            return
        buckets = sorted(
            {term_bucket(t, self.n_buckets) for _, t in missing}
        )
        import pyarrow.compute as pc

        filt = (
            pc.field("bucket").isin(buckets)
            & pc.field("term").isin(sorted({t for _, t in missing}))
            & pc.field("field").isin(sorted({f for f, _ in missing}))
        )
        rows = self._postings_ds.to_table(filter=filt).to_pylist()
        by_key: dict[tuple[str, str], list[dict]] = {p: [] for p in missing}
        for r in rows:
            key = (r["field"], r["term"])
            if key in by_key:
                by_key[key].append(r)
        for (f, t) in missing:
            self._term_cache[(f, t)] = _TermPostings(t, by_key[(f, t)])

    # ---------------------------------------------------------- scoring
    def _idf(self, df: int) -> np.float32:
        """Per-similarity idf: BM25Similarity.idf vs
        ClassicSimilarity.idf (log((docCount+1)/(docFreq+1)) + 1)."""
        if self.similarity == "classic":
            return np.float32(
                np.log((self.doc_count + 1) / float(df + 1)) + 1.0
            )
        return np.float32(
            np.log(1 + (self.doc_count - df + 0.5) / (df + 0.5))
        )

    def _weight_value(self, df: int) -> np.float32:
        idf = self._idf(df)
        if self.similarity == "classic":
            return idf  # IDFStats.queryWeight = boost * idf
        return np.float32(idf * (self.k1 + np.float32(1.0)))

    def _wv_from_idf_sum(self, idf_sum: np.float32) -> np.float32:
        if self.similarity == "classic":
            return idf_sum
        return np.float32(idf_sum * (self.k1 + np.float32(1.0)))

    def _term_wv(self, tp: "_TermPostings"):
        """Per-leaf weight for the scoring kernel: the LM family
        (lmd/lmjm) needs the term's collection probability, the
        SimilarityBase family (dfr/ib/dfi/ax/bool) its (df, ttf) stats
        pair, bm25/classic the idf-derived wv."""
        if self.similarity in ("lmd", "lmjm"):
            return self._lmd_pc(tp.ttf)
        from .similarities import SIMBASE

        if self.similarity in SIMBASE:
            return [(tp.n_docs, tp.ttf)]
        return self._weight_value(tp.n_docs)

    def _multi_wv(self, tps: list["_TermPostings"]):
        """Weight of a multi-term (phrase/span) node: the LM family
        carries the per-clause pc array (duplicates included, like the
        termStats[] handed to Similarity.computeWeight); bm25/classic
        the idf sum."""
        if self.similarity in ("lmd", "lmjm"):
            return np.array([self._lmd_pc(tp.ttf) for tp in tps],
                            dtype=np.float64)
        from .similarities import SIMBASE

        if self.similarity in SIMBASE:
            return [(tp.n_docs, tp.ttf) for tp in tps]
        idf_sum = np.float32(0.0)
        for tp in tps:
            idf_sum = np.float32(idf_sum + self._idf(tp.n_docs))
        return self._wv_from_idf_sum(idf_sum)

    @property
    def _lmd_dl(self) -> np.ndarray:
        """SimilarityBase.NORM_TABLE (SimilarityBase.java:220-227):
        decodeNormValue(byte) = 1/(f*f) with f = byte315ToFloat(byte),
        entry 0 patched to 1/table[255] (otherwise inf)."""
        from ..oracle.smallfloat import NORM_TABLE

        # identical construction to BM25's NORM_TABLE (1/f^2, entry 0
        # patched to 1/table[255]) — reuse it
        return NORM_TABLE

    def _lmd_pc(self, ttf: int) -> np.float32:
        """LMSimilarity.DefaultCollectionModel.computeProbability:
        (totalTermFreq+1F)/(numberOfFieldTokens+1F) — FLOAT division."""
        return np.float32(
            np.float32(ttf + 1.0) / np.float32(self.sum_ttf + 1.0)
        )

    def _lmd_score(self, freq: np.ndarray, dl: np.ndarray,
                   pcs) -> np.ndarray:
        """LMDirichletSimilarity.score for float64 freq/docLen arrays:
        per term pc, (float)(ln(1+freq/(mu*pc)) + ln(mu/(docLen+mu)))
        clipped at 0 (SimilarityBase.score returns 0 for negative);
        multi-term trees sum the clipped per-term float32 scores in
        order (MultiSimilarity.MultiSimScorer.score)."""
        mu = self.mu
        dnorm = np.log(mu / (dl + mu))
        pcs = np.atleast_1d(np.asarray(pcs, dtype=np.float64))
        total = np.zeros(freq.size, dtype=np.float32)
        for pc in pcs:
            s = (np.log1p(freq / (mu * float(pc))) + dnorm).astype(
                np.float32
            )
            total = (
                total + np.maximum(s, np.float32(0.0))
            ).astype(np.float32)
        return total

    def _lmjm_score(self, freq: np.ndarray, dl: np.ndarray,
                    pcs) -> np.ndarray:
        """LMJelinekMercerSimilarity.score
        (LMJelinekMercerSimilarity.java:54-59): per term pc,
        (float) ln(1 + ((1-lambda)*freq/docLen) / (lambda*pc)) —
        strictly positive for any present posting, so every fast path
        (block pruning, dense tables, TA, topcand) stays on; multi-term
        trees sum the per-term float32 scores (MultiSimScorer)."""
        lam = self.lmjm_lambda
        pcs = np.atleast_1d(np.asarray(pcs, dtype=np.float64))
        total = np.zeros(freq.size, dtype=np.float32)
        for pc in pcs:
            s = np.log1p(
                ((1.0 - lam) * freq / dl) / (lam * float(pc))
            ).astype(np.float32)
            total = (total + s).astype(np.float32)
        return total

    @property
    def _classic_norms(self) -> np.ndarray:
        """TFIDFSimilarity NORM_TABLE: byte315ToFloat per byte."""
        got = getattr(self, "_classic_norm_table", None)
        if got is None:
            from ..oracle.smallfloat import byte315_to_float

            got = self._classic_norm_table = byte315_to_float(
                np.arange(256, dtype=np.uint8)
            )
        return got

    def _score_freqs(self, freq: np.ndarray, norms: np.ndarray,
                     wv: np.float32) -> np.ndarray:
        """score(doc, freq) for float32 freqs + norm bytes: the shared
        term/phrase/span scoring kernel, per similarity.  For "lmd",
        `wv` carries the per-term collection probability (scalar for a
        term, array for multi-term phrase/span weights)."""
        from .similarities import SIMBASE, serving_scores

        if self.similarity in SIMBASE:
            # wv is the per-clause (df, ttf) list from _term_wv/_multi_wv
            return serving_scores(self.similarity, freq, norms, wv,
                                  self.doc_count, self.sum_ttf, self.avgdl)
        if self.similarity == "lmd":
            return self._lmd_score(
                freq.astype(np.float64),
                self._lmd_dl[norms].astype(np.float64), wv,
            )
        if self.similarity == "lmjm":
            return self._lmjm_score(
                freq.astype(np.float64),
                self._lmd_dl[norms].astype(np.float64), wv,
            )
        if self.similarity == "classic":
            raw = (np.sqrt(freq, dtype=np.float32) * wv).astype(np.float32)
            return (raw * self._classic_norms[norms]).astype(np.float32)
        return (wv * freq / (freq + self.cache[norms])).astype(np.float32)

    def _score_arrays(self, tfs: np.ndarray, norms: np.ndarray,
                      wv: np.float32) -> np.ndarray:
        return self._score_freqs(tfs.astype(np.float32), norms, wv)

    def _term_full(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        # full-list scores are a pure function of the searcher's fixed
        # global stats — cache them (the hot-postings-in-page-cache
        # trade; ~12 B/posting on top of the decoded blocks)
        got = getattr(self, "_fullscore_cache", None)
        if got is None:
            got = self._fullscore_cache = {}
        hit = got.get(term)
        if hit is not None:
            return hit
        tp = self._tp(term)
        docs, tfs, norms = tp.decode_all()
        wv = self._term_wv(tp)
        out = (docs, self._score_arrays(tfs, norms, wv))
        got[term] = out
        return out

    def _term_lookup(self, term: str, candidates: np.ndarray
                     ) -> tuple[np.ndarray, np.ndarray]:
        """Scores of `candidates` (sorted) that this term matches, decoding
        only blocks whose doc range intersects the candidates."""
        tp = self._tp(term)
        if not tp.blocks or candidates.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.float32)
        dense = getattr(self, "_dense_tables", {}).get(term)
        if dense is not None:
            # hot term with a cached dense table: O(|cand|) gather
            # beats re-concatenating ~all of a high-df posting list
            # on every repeated conjunction (the table exists exactly
            # when df*_DENSE_CACHE_FRAC >= max_doc, i.e. when the
            # block-subset path below would touch most blocks anyway)
            m, sc = dense
            hit = m[candidates]
            cd = candidates[hit]
            return cd, sc[cd]
        fd, ld = tp.block_ranges()
        # block i relevant iff any candidate in [fd[i], ld[i]]
        lo = np.searchsorted(candidates, fd, side="left")
        hi = np.searchsorted(candidates, ld, side="right")
        idxs = np.flatnonzero(hi > lo)
        if (idxs.size * 4 >= len(tp.blocks)
                and self._fastpaths
                and tp.n_docs * self._DENSE_CACHE_FRAC
                >= self.max_doc + 1
                and self.max_doc + 1 <= self._DENSE_MAX_DOC):
            # dense-cacheable hot term whose blocks the candidates
            # touch broadly (>= 1/4): build its score table ONCE and
            # gather — every later lookup is O(|cand|) instead of an
            # O(touched-df) per-query block concat + sorted filter
            # (the per-block python overhead of a wide subset decode
            # costs more than the one-time full-table scatter)
            m, sc = self._term_dense(term)
            cd = candidates[m[candidates]]
            return cd, sc[cd]
        if idxs.size * 4 >= len(tp.blocks) * 3:
            # nearly all blocks relevant: the cached full concatenation
            # beats re-concatenating a per-query block subset (the
            # membership mask below filters the extra docs anyway)
            idxs = np.arange(len(tp.blocks))
        docs, tfs, norms = tp.decode_blocks(idxs)
        if docs.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.float32)
        mask = _sorted_isin(docs, candidates)
        wv = self._term_wv(tp)
        return docs[mask], self._score_arrays(tfs[mask], norms[mask], wv)

    # ---------------------------------------------------------- rewrite
    def _terms_dataset(self):
        """Lazy pyarrow dataset over the term dictionary — multi-term
        rewrites push range predicates into this scan instead of ever
        materializing the dictionary in Python (VERDICT r1 scale fix:
        at 10^12-turn scale the dictionary alone would OOM the serving
        process)."""
        if not hasattr(self, "_terms_ds"):
            self._terms_ds = pads.dataset(
                os.path.join(self.index_dir, "term_stats"), format="parquet"
            )
        return self._terms_ds

    def rewrite(self, node):
        """Fixpoint-free single-pass rewrite (IndexSearcher.rewrite
        analogue): expand multi-term nodes against the term dictionary
        into constant-score unions (MultiTermQueryConstantScoreWrapper);
        raises TooManyClauses past 1024 expanded terms
        (BooleanQuery.java:43)."""
        from .multiterm import MULTI_TERM_KINDS, expand_from_dataset

        if node is None:
            return None
        kind = node[0]
        if kind in MULTI_TERM_KINDS:
            terms = expand_from_dataset(
                node, self._terms_dataset(), field="text"
            )
            if not terms:
                return ("matchnone",)
            return ("const_or", terms)
        if kind == "span_multi":
            # SpanMultiTermQueryWrapper: expand the wrapped multi-term
            # query against the dictionary into a SpanOr of term spans
            # (spans/SpanMultiTermQueryWrapper.java SpanRewriteMethod);
            # an empty expansion is a SpanOr of nothing (matches no doc)
            terms = expand_from_dataset(
                node[1], self._terms_dataset(), field="text"
            )
            return ("sor", sorted(terms))
        if kind == "span_near":
            return ("span_near", [self.rewrite(c) for c in node[1]],
                    node[2], node[3])
        if kind in ("span_first", "span_range"):
            return (kind, self.rewrite(node[1])) + tuple(node[2:])
        if kind in ("span_not", "span_containing", "span_within"):
            return (kind, self.rewrite(node[1]),
                    self.rewrite(node[2])) + tuple(node[3:])
        if kind == "synonym":
            # SynonymQuery.Builder sorts + dedupes its terms
            # (search/SynonymQuery.java constructor); one term left
            # degenerates to a plain TermQuery
            terms = sorted(set(node[1]))
            return ("term", terms[0]) if len(terms) == 1 else \
                ("synonym", terms)
        if kind in ("and", "or"):
            return (kind, [self.rewrite(c) for c in node[1]])
        if kind == "dismax":
            return ("dismax", [self.rewrite(c) for c in node[1]], node[2])
        if kind == "msm_or":
            return ("msm_or", node[1], [self.rewrite(c) for c in node[2]])
        if kind in ("andnot", "reqopt", "reqfilter"):
            return (kind, self.rewrite(node[1]), self.rewrite(node[2]))
        if kind == "boost":
            return ("boost", self.rewrite(node[1]), node[2])
        if kind == "filter0":
            return ("filter0", self.rewrite(node[1]))
        return node

    # ------------------------------------------------------------- eval
    def _collect_terms(self, node) -> list[tuple[str, str]]:
        """(field, term) pairs whose postings the query needs."""
        if node is None:
            return []
        kind = node[0]
        if kind == "term":
            return [("text", node[1])]
        if kind == "fterm":
            return [(node[1], node[2])]
        if kind in ("const_or", "synonym"):
            return [("text", t) for t in node[1]]
        if kind == "phrase":
            return [("text", t) for t, _ in node[1]]
        from .spans import SPAN_KINDS

        if kind in SPAN_KINDS:
            from .spans import span_terms

            return [("text", t) for t in span_terms(node)]
        if kind in ("matchnone", "tsrange"):
            return []
        if kind in ("andnot", "reqopt", "reqfilter"):
            return self._collect_terms(node[1]) + self._collect_terms(node[2])
        if kind in ("boost", "filter0"):
            return self._collect_terms(node[1])
        out = []
        for c in (node[2] if kind == "msm_or" else node[1]):
            out.extend(self._collect_terms(c))
        return out

    def _cost_of(self, node) -> int:
        """Upper-bound match count of a node (the Weight.cost() analogue,
        search/Weight.java) — drives the dense-vs-leapfrog AND choice."""
        kind = node[0]
        if kind == "term":
            return self._tp(node[1]).n_docs
        if kind == "fterm":
            return self._tp(node[2], node[1]).n_docs
        if kind in ("const_or", "synonym"):
            return sum(self._tp(t).n_docs for t in node[1])
        if kind == "matchnone":
            return 0
        if kind in ("tsrange", "filter0"):
            return self.max_doc
        if kind in ("andnot", "reqopt", "reqfilter", "boost"):
            return self._cost_of(node[1])
        if kind == "phrase":
            return min(self._tp(t).n_docs for t, _ in node[1])
        if kind == "span_near":
            return min(self._cost_of(c) for c in node[1])
        if kind == "sterm":
            return self._tp(node[1]).n_docs
        if kind == "sor":
            return sum(self._tp(t).n_docs for t in node[1])
        if kind in ("span_first", "span_not", "span_range"):
            return self._cost_of(node[1])
        if kind in ("span_containing", "span_within"):
            return min(self._cost_of(node[1]), self._cost_of(node[2]))
        if kind == "and":
            return min(self._cost_of(c) for c in node[1])
        children = node[2] if kind == "msm_or" else node[1]
        return sum(self._cost_of(c) for c in children)

    def _docs_of(self, node) -> np.ndarray:
        """Matching docIDs only (no scores) — the FILTER / MUST_NOT path
        (BooleanQuery needsScores=false, BooleanQuery.java:184-205)."""
        docs, _ = self._eval(node)
        return docs

    def _eval_phrase(self, clauses, slop: int = 0
                     ) -> tuple[np.ndarray, np.ndarray]:
        """PhraseScorer semantics:
        - exact (slop=0): freq = number of phrase start positions
          (search/ExactPhraseScorer.java), computed fully vectorized by
          intersecting (candidate, adjusted-position) keys;
        - sloppy: freq = sum of 1/(1+matchLength) over the reference's
          greedy window enumeration (query/sloppy.py,
          search/SloppyPhraseScorer.java:90-131).
        idf = SUM of per-clause idfs (BM25Similarity.idfExplain over the
        termStats array); score = weight * freq / (freq + cache[norm]).

        Positions are decoded ONLY for blocks whose doc range intersects
        the surviving candidate set: candidates come first from a
        cost-ordered docs-only intersection (rarest clause leads,
        ConjunctionDISI discipline), then each clause decodes just the
        blocks covering those docs."""
        empty = (np.empty(0, np.int64), np.empty(0, np.float32))
        tps = [self._tp(t) for t, _ in clauses]
        if any(not tp.blocks for tp in tps):
            return empty
        # 1) candidate docs: docs-only intersection, cheapest df leads,
        #    non-lead clauses decode only blocks overlapping candidates
        order = np.argsort([tp.n_docs for tp in tps], kind="stable")
        cand = tps[order[0]].decode_all()[0]
        for oi in order[1:]:
            if cand.size == 0:
                return empty
            tp = tps[oi]
            fd, ld = tp.block_ranges()
            lo = np.searchsorted(cand, fd, side="left")
            hi = np.searchsorted(cand, ld, side="right")
            docs = tp.decode_blocks(np.flatnonzero(hi > lo))[0]
            cand = cand[_sorted_isin(cand, docs)]
        if cand.size == 0:
            return empty
        # 2) positions for candidates only (per-clause block pruning)
        datas = []  # (poslists aligned to cand, rel)
        norms0 = None
        for (term, rel), tp in zip(clauses, tps):
            fd, ld = tp.block_ranges()
            lo = np.searchsorted(cand, fd, side="left")
            hi = np.searchsorted(cand, ld, side="right")
            docs, _, norms, pos = tp.decode_positions_blocks(
                np.flatnonzero(hi > lo)
            )
            sel = np.flatnonzero(_sorted_isin(docs, cand))
            datas.append(([pos[j] for j in sel], rel))
            if norms0 is None:
                norms0 = norms[sel]
        # 3) phrase freq per candidate
        if slop == 0:
            # vectorized: key = candidate_index * 2^32 + start position;
            # the phrase matches where all clauses share a start key
            keys: np.ndarray | None = None
            for poslists, rel in datas:
                counts = [p.size for p in poslists]
                flat = (
                    np.concatenate(poslists) if poslists
                    else np.empty(0, np.int64)
                ) - rel
                ci = np.repeat(np.arange(cand.size, dtype=np.int64), counts)
                ok = flat >= 0
                k = ci[ok] * (np.int64(1) << 32) + flat[ok]
                keys = k if keys is None else np.intersect1d(
                    keys, k, assume_unique=True
                )
                if keys.size == 0:
                    break
            freqs = (
                np.bincount((keys >> 32).astype(np.int64),
                            minlength=cand.size).astype(np.float32)
                if keys is not None and keys.size
                else np.zeros(cand.size, dtype=np.float32)
            )
        else:
            from .sloppy import repeat_groups, sloppy_freq

            rels = [rel for _, rel in datas]
            groups = repeat_groups([t for t, _ in clauses])
            freqs = np.zeros(cand.size, dtype=np.float32)
            for ci in range(cand.size):
                freqs[ci] = sloppy_freq(
                    [pl[ci] - rel for (pl, rel) in datas], rels, slop,
                    groups,
                )
        mask = freqs > 0
        cand, freqs, norms0 = cand[mask], freqs[mask], norms0[mask]
        if cand.size == 0:
            return empty
        # weight over clauses (duplicates included, like termStats[])
        wv = self._multi_wv(tps)
        scores = self._score_freqs(freqs, norms0, wv)
        return cand, scores

    def _eval(self, node) -> tuple[np.ndarray, np.ndarray]:
        # per-search memo: composite subtrees are evaluated once even
        # when referenced by both the candidate pass and the scoring
        # pass of an enclosing AND (results are immutable arrays)
        memo = getattr(self, "_eval_memo", None)
        if memo is not None and id(node) in memo:
            return memo[id(node)]
        out = self._eval_inner(node)
        if memo is not None:
            memo[id(node)] = out
        return out

    def _fterm_scores(self, field: str, term: str
                      ) -> tuple[np.ndarray, np.ndarray]:
        """Keyword-field TermQuery: per-FIELD collection stats for idf
        (index/FieldInfos.java — stats are per field), omitNorms scoring
        (StringField): BM25DocScorer with norms == null uses k1 as the
        norm value (BM25Similarity.java:229-254), so
        score = idf * (k1+1) * tf / (tf + k1) with tf = 1."""
        tp = self._tp(term, field)
        docs, tfs, _ = tp.decode_all()
        if docs.size == 0:
            return docs, np.empty(0, np.float32)
        dc_f = int(self.fstats.get(field, {}).get("doc_count", 0))
        df = tp.n_docs
        freq = tfs.astype(np.float32)
        from .similarities import SIMBASE, serving_scores

        if self.similarity in SIMBASE:
            # norms == null -> docLen = 1F (SimilarityBase.simScorer);
            # stats over the FIELD (FieldInfos discipline); per
            # fillBasicStats (SimilarityBase.java:100-140): tokens =
            # sumTotalTermFreq, avgdl = (float) tokens / docs — or
            # tokens = docFreq, avgdl = 1 when sttf <= 0
            sttf_f = int(
                self.fstats.get(field, {}).get("sum_total_term_freq", 0)
                or 0
            )
            if sttf_f > 0 and dc_f > 0:
                tokens_f, avgdl_f = sttf_f, np.float32(sttf_f / float(dc_f))
            else:
                tokens_f, avgdl_f = df, np.float32(1.0)
            return docs, serving_scores(
                self.similarity, freq, None, [(df, tp.ttf)], dc_f,
                tokens_f, avgdl_f, dl=np.ones(freq.size, dtype=np.float32),
            )
        if self.similarity in ("lmd", "lmjm"):
            # norms == null -> docLen = 1F (SimilarityBase.simScorer);
            # pc over the FIELD's token count (per-field stats)
            sttf_f = int(
                self.fstats.get(field, {}).get("sum_total_term_freq", 0)
                or 0
            )
            pc = np.float32(
                np.float32(tp.ttf + 1.0) / np.float32(sttf_f + 1.0)
            )
            if self.similarity == "lmjm":
                lam = self.lmjm_lambda
                s = np.log1p(
                    ((1.0 - lam) * freq.astype(np.float64))
                    / (lam * float(pc))
                ).astype(np.float32)
                return docs, s
            s = (
                np.log1p(freq.astype(np.float64) / (self.mu * float(pc)))
                + np.log(self.mu / (1.0 + self.mu))
            ).astype(np.float32)
            return docs, np.maximum(s, np.float32(0.0))
        if self.similarity == "classic":
            # TFIDFSimScorer with norms == null returns raw (no norm)
            idf = np.float32(np.log((dc_f + 1) / float(df + 1)) + 1.0)
            return docs, (np.sqrt(freq, dtype=np.float32) * idf).astype(
                np.float32
            )
        idf = np.float32(np.log(1 + (dc_f - df + 0.5) / (df + 0.5)))
        wv = np.float32(idf * (self.k1 + np.float32(1.0)))
        return docs, (wv * freq / (freq + self.k1)).astype(np.float32)

    def _ts_docs(self, node) -> np.ndarray:
        """Sorted docIDs whose `ts` lies in the range — the
        PointRangeQuery analogue: the predicate pushes into the docmap
        parquet scan (column-pruned to doc_id/ts, row groups pruned by
        ts min/max stats — the BKD-tree role)."""
        import pyarrow.compute as pc

        _, lo, hi, il, ih = node
        if not hasattr(self, "_docmap_ds"):
            self._docmap_ds = pads.dataset(
                os.path.join(self.index_dir, "docmap"), format="parquet",
                partitioning="hive",
            )
        filt = pc.field("ts").is_valid()
        if lo is not None:
            lov = np.datetime64(lo)
            filt = filt & (
                pc.field("ts") >= lov if il else pc.field("ts") > lov
            )
        if hi is not None:
            hiv = np.datetime64(hi)
            filt = filt & (
                pc.field("ts") <= hiv if ih else pc.field("ts") < hiv
            )
        tbl = self._docmap_ds.to_table(columns=["doc_id"], filter=filt)
        return np.sort(tbl.column("doc_id").to_numpy())

    def _span_required_docs(self, clause) -> np.ndarray:
        """Docs that can possibly match a span clause (the two-phase
        approximation): term -> its postings; or -> union; near ->
        intersection over clauses; first -> child; not -> include."""
        kind = clause[0]
        if kind == "sterm":
            tp = self._tp(clause[1])
            return tp.decode_all()[0] if tp.blocks else np.empty(0, np.int64)
        if kind == "sor":
            parts = [
                self._tp(t).decode_all()[0]
                for t in clause[1] if self._tp(t).blocks
            ]
            if not parts:
                return np.empty(0, np.int64)
            return (
                parts[0] if len(parts) == 1
                else np.unique(np.concatenate(parts))
            )
        if kind == "span_near":
            subs = [self._span_required_docs(c) for c in clause[1]]
            order = np.argsort([d.size for d in subs], kind="stable")
            cand = subs[order[0]]
            for oi in order[1:]:
                if cand.size == 0:
                    break
                cand = cand[_sorted_isin(cand, subs[oi])]
            return cand
        if kind in ("span_first", "span_not", "span_range"):
            return self._span_required_docs(clause[1])
        if kind in ("span_containing", "span_within"):
            # ConjunctionSpans(big, little): both sides must match the doc
            big = self._span_required_docs(clause[1])
            little = self._span_required_docs(clause[2])
            if big.size > little.size:
                big, little = little, big
            return big[_sorted_isin(big, little)]
        raise ValueError(kind)

    def _span_term_data(self, all_terms, cand):
        """Per-term candidate alignment for span evaluation, computed
        ONCE with vectorized searchsorted: term -> (present bool[cand],
        row int[cand] into pos/norms, pos lists, norms)."""
        term_data = {}
        for t in all_terms:
            tp = self._tp(t)
            if not tp.blocks:
                continue
            fd, ld = tp.block_ranges()
            lo = np.searchsorted(cand, fd, side="left")
            hi = np.searchsorted(cand, ld, side="right")
            docs, _, norms, pos = tp.decode_positions_blocks(
                np.flatnonzero(hi > lo)
            )
            if docs.size == 0:
                continue
            row = np.searchsorted(docs, cand)
            row[row == docs.size] = docs.size - 1
            present = docs[row] == cand
            term_data[t] = (present, row, pos, norms)
        return term_data

    def _span_freqs_ordered_terms(self, clauses, slop: int, cand: np.ndarray,
                                  term_data) -> np.ndarray:
        """Vectorized NearSpansOrdered over ALL candidate docs at once for
        the all-SpanTermQuery clause case (the common shape): flatten each
        clause's candidate positions into (doc_index << 32 | pos) keys;
        stretchToOrder is one searchsorted per later clause over all
        clause-0 occurrences simultaneously (NearSpansOrdered.java:95-125
        semantics, batch form).  freq accumulates per doc in enumeration
        (start) order with EXACT float32 sequential discipline via
        per-rank rounds, matching span_freq bit-for-bit."""
        n = cand.size
        terms = [c[1] for c in clauses]
        flats, cis, keys = [], [], []
        for t in terms:
            present, row, pos, _ = term_data[t]
            # every cand doc contains every clause term (cand is the
            # conjunction), so present is all-True here
            plists = [pos[r] for r in row.tolist()]
            counts = np.array([p.size for p in plists], dtype=np.int64)
            flat = (
                np.concatenate(plists) if plists else np.empty(0, np.int64)
            ).astype(np.int64)
            ci = np.repeat(np.arange(n, dtype=np.int64), counts)
            flats.append(flat)
            cis.append(ci)
            keys.append((ci << 32) | flat)
        # enumerate from clause 0's occurrences
        ci0 = cis[0]
        width = np.zeros(ci0.size, dtype=np.int64)
        prev_end = flats[0] + 1
        valid = np.ones(ci0.size, dtype=bool)
        for i in range(1, len(clauses)):
            want = (ci0 << 32) | prev_end
            j = np.searchsorted(keys[i], want, side="left")
            j_c = np.minimum(j, keys[i].size - 1) if keys[i].size else j
            ok = (keys[i].size > 0) & (j < keys[i].size)
            ok &= cis[i][j_c] == ci0
            valid &= ok
            pos_i = flats[i][j_c]
            width += np.where(valid, pos_i - prev_end, 0)
            prev_end = np.where(valid, pos_i + 1, prev_end)
        match = valid & (width <= slop)
        freqs = np.zeros(n, dtype=np.float32)
        if not match.any():
            return freqs
        mci = ci0[match]
        factors = (
            np.float32(1.0)
            / (width[match].astype(np.float32) + np.float32(1.0))
        ).astype(np.float32)
        # per-doc sequential float32 accumulation, one vectorized round
        # per within-doc match rank (matches are already in start order)
        rank = np.arange(mci.size, dtype=np.int64)
        first = np.concatenate(([0], np.flatnonzero(np.diff(mci)) + 1))
        rank = rank - np.repeat(first, np.diff(np.concatenate((first, [mci.size]))))
        for r in range(int(rank.max()) + 1):
            sel = rank == r
            freqs[mci[sel]] = (freqs[mci[sel]] + factors[sel]).astype(
                np.float32
            )
        return freqs

    def _eval_span(self, node) -> tuple[np.ndarray, np.ndarray]:
        """Span-query evaluation (SpanNear ordered/unordered, SpanOr,
        SpanFirst, SpanNot, SpanContaining/Within/PositionRange —
        composable/nested): match enumeration per query/spans.py (the
        NearSpans* spec); freq is the float32 sum of 1/(1+width) over the
        top clause's spans (SpanScorer.java:90-110); BM25 weight uses the
        summed idf of the DEDUPLICATED scoring terms
        (SpanWeight.buildSimWeight — a top-level SpanNot weights
        include+exclude terms, a nested one only include).

        The ordered all-term SpanNear (the common shape) runs through a
        fully-vectorized batch enumeration; every other shape runs the
        CSR batch kernels of query/spans_batch.py — no per-doc Python
        in any span path."""
        from .spans import span_terms

        empty = (np.empty(0, np.int64), np.empty(0, np.float32))
        all_terms = sorted(set(span_terms(node)))
        cand = self._span_required_docs(node)
        if cand.size == 0:
            return empty
        term_data = self._span_term_data(all_terms, cand)
        # norm byte per candidate: the doc's norm, from any present term
        normsb = np.zeros(cand.size, dtype=np.uint8)
        havenorm = np.zeros(cand.size, dtype=bool)
        for t in all_terms:
            got = term_data.get(t)
            if got is None:
                continue
            present, row, _, norms = got
            take = present & ~havenorm
            normsb[take] = norms[row[take]]
            havenorm |= present
        if (
            node[0] == "span_near" and node[3]
            and all(c[0] == "sterm" for c in node[1])
            and all(c[1] in term_data for c in node[1])
        ):
            freqs = self._span_freqs_ordered_terms(
                node[1], node[2], cand, term_data
            )
        else:
            # general shapes (unordered near, nesting, contain family):
            # batch CSR evaluation — no per-doc Python (spans_batch is
            # the vectorized restatement of doc_spans)
            from .spans_batch import (
                batch_doc_spans, batch_span_freqs, from_positions,
            )
            from .spans_batch import empty as empty_batch

            n = cand.size
            bs_cache: dict[str, object] = {}

            def term_batch(t):
                bs = bs_cache.get(t)
                if bs is None:
                    got = term_data.get(t)
                    if got is None:
                        bs = empty_batch(n)
                    else:
                        present, row, pos, _ = got
                        bs = from_positions(
                            [pos[r] if p else None for p, r in
                             zip(present.tolist(), row.tolist())], n
                        )
                    bs_cache[t] = bs
                return bs

            freqs = batch_span_freqs(batch_doc_spans(node, n, term_batch))
        mask = freqs > 0
        cand, freqs, normsb = cand[mask], freqs[mask], normsb[mask]
        if cand.size == 0:
            return empty
        wv = self._multi_wv(
            [self._tp(t)
             for t in sorted(set(span_terms(node, scoring=True, top=True)))]
        )
        scores = self._score_freqs(freqs, normsb, wv)
        return cand, scores

    def _pseudo_wv(self, df: int, ttf: int):
        """Scoring weight from PSEUDO term stats (SynonymQuery.java:
        134-147: docFreq = max over terms, totalTermFreq = sum) —
        the per-similarity shape of _term_wv."""
        if self.similarity in ("lmd", "lmjm"):
            return self._lmd_pc(ttf)
        from .similarities import SIMBASE

        if self.similarity in SIMBASE:
            return [(df, ttf)]
        return self._weight_value(df)

    def _synonym_eval(self, terms: list[str]
                      ) -> tuple[np.ndarray, np.ndarray]:
        """SynonymQuery (search/SynonymQuery.java): score the terms as
        ONE pseudo-term — per doc, freq = SUM of the synonyms' freqs
        (SynonymScorer), weight from pseudo stats docFreq = max,
        totalTermFreq = sum; same doc => same norm byte, so norms come
        from whichever synonym saw the doc."""
        tps = [self._tp(t) for t in terms if self._tp(t).blocks]
        if not tps:
            return np.empty(0, np.int64), np.empty(0, np.float32)
        df = max(tp.n_docs for tp in tps)
        ttf = sum(tp.ttf for tp in tps)
        parts = [tp.decode_all() for tp in tps]
        docs_u = np.unique(np.concatenate([p[0] for p in parts]))
        freq = np.zeros(docs_u.size, dtype=np.float32)
        norms = np.zeros(docs_u.size, dtype=np.uint8)
        for d, tfs, nb in parts:
            idx = np.searchsorted(docs_u, d)
            np.add.at(freq, idx, tfs.astype(np.float32))
            norms[idx] = nb
        return docs_u, self._score_freqs(
            freq, norms, self._pseudo_wv(df, ttf)
        )

    def _eval_inner(self, node) -> tuple[np.ndarray, np.ndarray]:
        kind = node[0]
        if kind == "term":
            return self._term_full(node[1])
        if kind == "synonym":
            return self._synonym_eval(node[1])
        from .spans import SPAN_KINDS

        if kind in SPAN_KINDS:
            return self._eval_span(node)
        if kind == "fterm":
            return self._fterm_scores(node[1], node[2])
        if kind == "tsrange":
            # PointRangeQuery is constant-score (1.0) as a scoring clause
            docs = self._ts_docs(node)
            return docs, np.ones(docs.size, dtype=np.float32)
        if kind == "reqfilter":
            # Occur.FILTER: must match, contributes no score
            # (BooleanQuery.java:184-205 needsScores=false clauses)
            pd_, ps = self._eval(node[1])
            if pd_.size == 0:
                return pd_, ps
            fd = self._docs_of(node[2])
            keep = _sorted_isin(pd_, fd)
            return pd_[keep], ps[keep]
        if kind == "filter0":
            # only-FILTER query: matching docs, all scores 0
            docs = self._docs_of(node[1])
            return docs, np.zeros(docs.size, dtype=np.float32)
        if kind == "matchnone":
            return np.empty(0, np.int64), np.empty(0, np.float32)
        if kind == "const_or":
            # MultiTermQueryConstantScoreWrapper: every matching doc
            # scores the boost (1.0 here; boost applies via the boost node)
            parts = [self._tp(t).decode_all()[0] for t in node[1]]
            docs = (
                np.unique(np.concatenate(parts)) if parts
                else np.empty(0, np.int64)
            )
            return docs, np.ones(docs.size, dtype=np.float32)
        if kind == "boost":
            docs, scores = self._eval(node[1])
            return docs, (scores * np.float32(node[2])).astype(np.float32)
        if kind == "phrase":
            return self._eval_phrase(node[1], node[2] if len(node) > 2 else 0)
        if kind == "msm_or":
            # MinShouldMatchSumScorer: doc matches when >= n SHOULD
            # clauses match; score = double sum of matching clause scores
            # (search/MinShouldMatchSumScorer.java, BooleanQuery.java:77-96)
            n = node[1]
            parts = [self._eval(c) for c in node[2]]
            return self._sum_parts(parts, min_match=n)
        if kind == "dismax":
            # DisjunctionMaxScorer.score (DisjunctionMaxScorer.java:
            # 49-61): union of disjunct docs, score = max + tie *
            # (sum - max) — clause-order double sum + double max, then
            # the float32 cast, mirroring the or-node discipline so
            # local == distributed bit-for-bit
            tie = np.float64(node[2])
            parts = [self._eval(c) for c in node[1]]
            parts = [p for p in parts if p[0].size]
            if not parts:
                return np.empty(0, np.int64), np.empty(0, np.float32)
            docs = np.unique(np.concatenate([p[0] for p in parts]))
            total = np.zeros(docs.size, dtype=np.float64)
            mx = np.full(docs.size, -np.inf, dtype=np.float64)
            for cd, cs in parts:
                idx = np.searchsorted(docs, cd)
                c64 = cs.astype(np.float64)
                np.add.at(total, idx, c64)
                np.maximum.at(mx, idx, c64)
            return docs, (mx + (total - mx) * tie).astype(np.float32)
        if kind == "andnot":
            docs, scores = self._eval(node[1])
            if docs.size == 0:
                return docs, scores
            neg = self._docs_of(node[2])
            keep = ~_sorted_isin(docs, neg)
            return docs[keep], scores[keep]
        if kind == "reqopt":
            # ReqOptSumScorer: required docs, + optional score where present
            rd, rs = self._eval(node[1])
            if rd.size == 0:
                return rd, rs
            od, os_ = self._eval(node[2])
            total = rs.astype(np.float64)
            if od.size:
                m = _sorted_isin(od, rd)
                od, os_ = od[m], os_[m]
                total[np.searchsorted(rd, od)] += os_.astype(np.float64)
            return rd, total.astype(np.float32)
        children = node[1]
        if kind == "and":
            # WARM, comparably-sized lists: one dense count+sum pass
            # over the full child lists beats the leapfrog (no
            # searchsorted chains) — the windowed-BooleanScorer cost
            # choice.  When one clause is much rarer than the rest
            # (min-cost << total) the leapfrog's candidate-driven
            # lookups touch only O(min df) postings, so it stays the
            # winner; cold term lists also keep the leapfrog, whose
            # block-range skipping avoids decoding non-candidate blocks.
            if self.max_doc + 1 <= self._DENSE_MAX_DOC and self._fastpaths:
                tnames = [t for f, t in self._collect_terms(node)
                          if f == "text"]
                costs = [self._cost_of(c) for c in children]
                # dense when the cheapest clause is not tiny: the
                # leapfrog touches O(min df) postings, so a rare lead
                # keeps it; otherwise mask-first dense evaluation costs
                # a few contiguous full-array passes regardless of
                # clause balance (the windowed-BooleanScorer choice)
                if (
                    (not tnames or not self._mostly_undecoded(tnames))
                    and min(costs) * 16 >= self.max_doc + 1
                ):
                    got = self._dense_tree_eval(node)
                    if got is not None:
                        return got
                if (
                    (not tnames or not self._mostly_undecoded(tnames))
                    and min(costs) * 4 >= sum(costs)
                ):
                    parts = [self._eval(c) for c in children]
                    return self._sum_parts(parts, min_match=len(children))

            # cost order: cheapest df leads (ConjunctionDISI discipline)
            def df_of(n):
                if n[0] == "term":
                    return self._tp(n[1]).n_docs
                return self.max_doc + 1  # composite: evaluate late

            ordered = sorted(range(len(children)), key=lambda i: df_of(children[i]))
            # intersection pass; per-child contributions computed along
            # the way are kept and FILTERED to the final candidates in
            # the scoring pass instead of being recomputed (the scores
            # of a (term, doc) pair are deterministic, so reuse is exact)
            pass1: dict[int, tuple[np.ndarray, np.ndarray]] = {}
            lead_i = ordered[0]
            lead = children[lead_i]
            if lead[0] == "term":
                cand = self._tp(lead[1]).decode_all()[0]
            else:
                cand, cs0 = self._eval(lead)
                pass1[lead_i] = (cand, cs0)
            for i in ordered[1:]:
                ch = children[i]
                if cand.size == 0:
                    break
                if ch[0] == "term":
                    cd, cs = self._term_lookup(ch[1], cand)
                else:
                    cd, cs = self._eval_at(ch, cand)
                pass1[i] = (cd, cs)
                cand = cd
            if cand.size == 0:
                return cand, np.empty(0, np.float32)
            # exact scores in clause order (ConjunctionScorer double sum)
            total = np.zeros(cand.size, dtype=np.float64)
            for i, ch in enumerate(children):
                got = pass1.get(i)
                if got is not None:
                    cd, cs = got
                    if cd.size != cand.size:  # cand ⊆ cd: filter down
                        m = _sorted_isin(cd, cand)
                        cd, cs = cd[m], cs[m]
                elif ch[0] == "term":
                    cd, cs = self._term_lookup(ch[1], cand)
                else:
                    cd, cs = self._eval_at(ch, cand)
                idx = np.searchsorted(cand, cd)
                total[idx] += cs.astype(np.float64)
            return cand, total.astype(np.float32)
        if kind == "or":
            # scatter-accumulate (_sum_parts): disjunction cost scales
            # with sum(df) — a mask-first gather would pay
            # n_children * |union| instead, which loses for skewed ORs
            parts = [self._eval(c) for c in children]
            return self._sum_parts(parts)
        raise ValueError(kind)

    #: default warm-path memory budget (MB) — overridable per instance
    #: (LocalSearcher(dense_budget_mb=...)) or process
    #: (LSS_DENSE_BUDGET_MB).  _DENSE_MAX_DOC is DERIVED from it in
    #: __init__ as budget/16 bytes-per-doc (the per-doc residency of
    #: the dense structures: 8 B transient float64 accumulator + 4 B
    #: one hot score table + 1 B derived mask + 1 B TA seen bitmap +
    #: slack — see SCALE.md "Warm-path memory budget"); the default
    #: 128 MB keeps the historical 2^23-doc shard bound.  Beyond the
    #: bound the sparse sort-merge path takes over — correctness never
    #: depends on the budget.
    _DENSE_BUDGET_MB_DEFAULT = 128
    _DENSE_MAX_DOC = (128 << 20) // 16  # class fallback == default

    #: a term's dense score table is CACHED when df * 64 >= max_doc
    #: (sparser terms get an ephemeral table per query — a cheap
    #: df-sized scatter — so the memory budget stays on the hot terms
    #: where the table is actually reused)
    _DENSE_CACHE_FRAC = 64

    def _term_dense(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """(mask bool[n], scores float32[n]) dense table for one term —
        the BooleanScorer bucket table hoisted into a per-term CACHE so
        a warm query pays zero scatter.  score != 0 exactly at postings
        (BM25 and classic scores are strictly positive for any present
        posting: idf > 0, freq >= 1, norm > 0 for dl >= 1), so the mask
        is derived, not stored separately on disk."""
        cache = getattr(self, "_dense_tables", None)
        if cache is None:
            from collections import OrderedDict

            cache = self._dense_tables = OrderedDict()
        got = cache.get(term)
        if got is not None:
            cache.move_to_end(term)  # LRU touch
            return got
        memo = getattr(self, "_eval_memo", None)
        key = ("dtbl", term)
        if memo is not None and key in memo:
            return memo[key]
        n = self.max_doc + 1
        docs, scores = self._term_full(term)
        tbl = np.zeros(n, dtype=np.float32)
        tbl[docs] = scores
        out = (tbl != np.float32(0.0), tbl)
        if docs.size * self._DENSE_CACHE_FRAC >= n:
            cache[term] = out
            # half the budget bounds the hot-table cache (5 B/doc per
            # entry); evict least-recently-used beyond it
            max_tables = max(1, (self.dense_budget_bytes // 2) // (5 * n))
            while len(cache) > max_tables:
                cache.popitem(last=False)
        elif memo is not None:
            memo[key] = out  # ephemeral: reused within this search only
        return out

    def _dense_mask(self, node) -> np.ndarray | None:
        """Boolean match mask of an and/or/msm_or tree of TERM leaves —
        masks combine with full-array bool ops BEFORE any scoring, so an
        AND prunes the scoring domain to its intersection for free.
        None for an unsupported shape."""
        kind = node[0]
        memo = getattr(self, "_eval_memo", None)
        key = ("dmask", id(node))
        if memo is not None and key in memo:
            return memo[key]
        if kind == "term":
            out = self._term_dense(node[1])[0]
        else:
            if kind == "msm_or":
                children, n_min = node[2], node[1]
            elif kind in ("and", "or"):
                children, n_min = node[1], None
            else:
                return None
            masks = []
            for c in children:
                m = self._dense_mask(c)
                if m is None:
                    return None
                masks.append(m)
            if kind == "msm_or":
                cnt = masks[0].astype(np.int16)
                for m in masks[1:]:
                    cnt += m
                out = cnt >= n_min
            else:
                out = masks[0].copy()
                for m in masks[1:]:
                    (out.__iand__ if kind == "and" else out.__ior__)(m)
        if memo is not None:
            memo[key] = out
        return out

    def _dense_scores_at(self, node, docs: np.ndarray) -> np.ndarray:
        """float32 scores of the tree at the given docs: per-clause
        table gathers accumulated in clause order in float64, float32
        cast at every composite node boundary — bit-identical to the
        sparse combiners (absent terms contribute an exact 0.0, which
        never perturbs a float64 partial sum).  and/msm nodes zero
        their value at docs failing their own mask (a partially-matched
        AND contributes nothing to an enclosing OR, exactly like the
        sparse evaluator's candidate filtering)."""
        kind = node[0]
        if kind == "term":
            return self._term_dense(node[1])[1][docs]
        children = node[2] if kind == "msm_or" else node[1]
        acc = np.zeros(docs.size, dtype=np.float64)
        for c in children:
            acc += self._dense_scores_at(c, docs)
        out = acc.astype(np.float32)
        if kind in ("and", "msm_or"):
            out *= self._dense_mask(node)[docs]
        return out

    def _eval_at(self, node, cand: np.ndarray):
        """(docs, scores) of `node` restricted to the sorted candidate
        set — dense-table gather when the node supports it (O(|cand|)
        per clause instead of a full disjunction scatter), else full
        evaluation + filter.  Used for composite clauses inside the
        AND leapfrog, where `cand` is already small.  The dense path is
        gated on the node's term lists being mostly decoded already
        (same cold-list guard as the sibling gates above): building a
        dense table for a cold high-df composite child would force a
        full-postings decode and defeat block pruning on first-touch
        queries."""
        if self.max_doc + 1 <= self._DENSE_MAX_DOC and self._fastpaths:
            tnames = [t for f, t in self._collect_terms(node) if f == "text"]
            if not tnames or not self._mostly_undecoded(tnames):
                m = self._dense_mask(node)
                if m is not None:
                    cd = cand[m[cand]]
                    return cd, self._dense_scores_at(node, cd)
        cd, cs = self._eval(node)
        m = _sorted_isin(cd, cand)
        return cd[m], cs[m]

    def _dense_tree_eval(self, node):
        """(docs, scores) via mask-first dense evaluation: masks combine
        before any scoring, so scores are gathered only at matching
        docs.  Returns None for unsupported shapes."""
        if self.max_doc + 1 > self._DENSE_MAX_DOC:
            return None
        mask = self._dense_mask(node)
        if mask is None:
            return None
        docs = np.flatnonzero(mask)
        if docs.size == 0:
            return docs, np.empty(0, np.float32)
        return docs, self._dense_scores_at(node, docs)

    def _sum_parts(self, parts, min_match: int | None = None
                   ) -> tuple[np.ndarray, np.ndarray]:
        """Disjunction sum over child (docs, scores) parts, in clause
        order, double accumulate, float32 cast.

        Fast path: a searcher-owned DENSE score/flag table indexed by
        docID — the BooleanScorer bucket-table discipline
        (search/BooleanScorer.java:60-90 scores windows of docs into a
        dense bucket array instead of merging sorted streams).  Each
        part lands with one vectorized scatter-add (docs are unique per
        part), so the per-query cost is O(sum of list lengths), with no
        sort and no per-part searchsorted.  Falls back to the sparse
        unique+add.at merge when the shard's docID space exceeds
        _DENSE_MAX_DOC."""
        parts = [p for p in parts if p[0].size]
        if not parts:
            return np.empty(0, np.int64), np.empty(0, np.float32)
        n = self.max_doc + 1
        if 0 < n <= self._DENSE_MAX_DOC:
            if not hasattr(self, "_acc_buf"):
                self._acc_buf = np.zeros(n, dtype=np.float64)
                self._seen_buf = np.zeros(n, dtype=bool)
                self._cnt_buf = np.zeros(n, dtype=np.int32)
            buf, seen, cnt = self._acc_buf, self._seen_buf, self._cnt_buf
            docs = np.empty(0, np.int64)
            try:
                for cd, cs in parts:
                    buf[cd] += cs.astype(np.float64)
                    seen[cd] = True
                    if min_match is not None:
                        cnt[cd] += 1
                docs = np.flatnonzero(seen)
                scores = buf[docs].astype(np.float32)
                if min_match is not None:
                    keep = cnt[docs] >= min_match
                    out = (docs[keep], scores[keep])
                else:
                    out = (docs, scores)
            finally:
                # always restore the scratch table, even on interrupts
                buf[docs] = 0.0
                seen[docs] = False
                if min_match is not None:
                    cnt[docs] = 0
                if docs.size == 0:
                    for cd, _ in parts:  # cleanup after a mid-part error
                        buf[cd] = 0.0
                        seen[cd] = False
                        cnt[cd] = 0
            return out
        all_docs = np.concatenate([p[0] for p in parts])
        docs = np.unique(all_docs)
        total = np.zeros(docs.size, dtype=np.float64)
        cnts = np.zeros(docs.size, dtype=np.int64)
        for cd, cs in parts:
            idx = np.searchsorted(docs, cd)
            np.add.at(total, idx, cs.astype(np.float64))
            if min_match is not None:
                np.add.at(cnts, idx, 1)
        if min_match is not None:
            keep = cnts >= min_match
            return docs[keep], total[keep].astype(np.float32)
        return docs, total.astype(np.float32)

    #: size of the cached per-term top-candidate pool
    _TOPCAND_M = 2048

    def _term_topcand(self, term: str):
        """(docs, scores, thr): the term's global top-M postings by
        score plus thr = the best score OUTSIDE the pool.  A warm
        single-term top-k is answered from the pool alone whenever >= k
        pool entries score STRICTLY above thr after delete/cursor
        masking — every excluded posting scores <= thr, strictly below
        the selected k, so the page is exact including docID
        tie-breaks."""
        cache = getattr(self, "_topcand_cache", None)
        if cache is None:
            cache = self._topcand_cache = {}
        got = cache.get(term)
        if got is not None:
            return got
        docs, scores = self._term_full(term)
        m = self._TOPCAND_M
        if docs.size <= m:
            out = (docs, scores, -np.inf)
        else:
            part = np.argpartition(scores, docs.size - m)
            keep = np.sort(part[docs.size - m:])
            thr = float(scores[part[: docs.size - m]].max())
            out = (docs[keep], scores[keep], thr)
        cache[term] = out
        return out

    def _search_term_topcand(self, term: str, k: int, after=None):
        """Warm single-term top-k from the cached candidate pool, or
        None when the pool can't prove exactness for this page."""
        cd, cs, thr = self._term_topcand(term)
        keep = np.ones(cd.size, dtype=bool)
        if self._deleted.size:
            keep &= ~_sorted_isin(cd, self._deleted)
        if after is not None:
            keep &= _cursor_mask(cd, cs, after)
        strong = keep & (cs > np.float32(thr))
        if np.count_nonzero(strong) < k:
            return None
        return _topk_hits(cd[strong], cs[strong], k)

    def _term_scoredesc(self, term: str):
        """(docs, scores) of one term ordered by score DESCENDING —
        cached; the access lists of the threshold-algorithm OR."""
        cache = getattr(self, "_scoredesc_cache", None)
        if cache is None:
            cache = self._scoredesc_cache = {}
        got = cache.get(term)
        if got is None:
            docs, scores = self._term_full(term)
            order = np.argsort(-scores, kind="stable")
            got = cache[term] = (docs[order], scores[order])
        return got

    def _search_tree_ta(self, node, k: int, after=None):
        """Exact top-k of an and/or/msm tree via the threshold algorithm
        over per-leaf score-descending lists (the WAND /
        TopScoreDocCollector early-termination role for WARM lists):
        consume the leaf lists in batches, evaluate every newly seen doc
        exactly (dense mask + clause-order gathered sums), and stop once
        the k-th collected score strictly beats the sum of the lists'
        next-unseen scores (+1e-6 float guard, as in _block_ubs).  The
        bound is sound for any tree of non-negative contributions: an
        unseen doc's score is at most the sum of its per-leaf scores,
        each bounded by that leaf's cursor entry.  Returns None when the
        bound cannot prove exactness by half a full pass (the dense /
        scatter paths take over)."""
        n = self.max_doc + 1
        if n > self._DENSE_MAX_DOC:
            return None
        leaf_terms = [t for f, t in self._collect_terms(node)
                      if f == "text"]
        terms = sorted(set(leaf_terms))
        if node[0] == "and":
            costs = [self._cost_of(c) for c in node[1]]
            if min(costs) == 0:
                # a required conjunct matches nothing (absent term):
                # the intersection is provably empty — never start TA
                return []
        if not terms or self._mostly_undecoded(terms):
            return None  # cold lists: the block-pruning paths decode less
        if node[0] == "or" and all(c[0] == "term" for c in node[1]):
            # pure term disjunction: ANY leaf hit matches, so the
            # O(n_children * max_doc) dense tree-mask OR is pure waste
            # — candidates come straight from the leaf lists
            mask = None
        else:
            mask = self._dense_mask(node)
            if mask is None:
                return None
        if node[0] == "and":
            # SELECTIVE conjunction: the result is a subset of the
            # cheapest conjunct's matches, so an exact dense-gather
            # over those candidates costs O(min_cost) — while TA
            # consumes a prefix of EVERY leaf's score-descending list
            # (up to half their total length) before its bound can
            # prove anything.  Crossover measured at sf0.1 (r3 bench
            # regression and3_1/and3_3: 0.4ms candidate vs 1.3-2.0ms
            # TA; and2_4/mixed_8 where min_cost ~ total stay TA-won).
            mn = min(costs)
            lead = node[1][int(np.argmin(costs))]
            total_docs = sum(self._tp(t).n_docs for t in terms)
            if lead[0] == "term" and mn * 8 <= total_docs:
                cand = self._tp(lead[1]).decode_all()[0]
                cand = cand[mask[cand]]
                if cand.size == 0:
                    return []
                cs = self._dense_scores_at(node, cand)
                keep = np.ones(cand.size, dtype=bool)
                if self._deleted.size:
                    keep &= ~_sorted_isin(cand, self._deleted)
                if after is not None:
                    keep &= _cursor_mask(cand, cs, after)
                return _topk_hits(cand[keep], cs[keep], k)
        # a term appearing in several leaves contributes once per leaf
        # to a doc's score, so the unseen-doc bound must weight each
        # list's cursor by that multiplicity
        mult = [leaf_terms.count(t) for t in terms]
        lists = [self._term_scoredesc(t) for t in terms]
        seen = np.zeros(n, dtype=bool)
        cursors = [0] * len(terms)
        kept_d: list[np.ndarray] = []
        kept_s: list[np.ndarray] = []
        n_kept = 0
        theta = -np.inf
        # bounded top-k pool for theta (same O(batch+k) discipline as
        # _search_term_pruned — never re-partition the full kept set)
        pool = np.empty(0, dtype=np.float32)
        batch = 1024
        total_len = sum(ld.size for ld, _ in lists)
        consumed = 0
        while True:
            ub = sum(
                m * float(ls[c])
                for (_, ls), c, m in zip(lists, cursors, mult)
                if c < ls.size
            ) * (1.0 + 1e-6)
            done = all(c >= ls.size for (_, ls), c in zip(lists, cursors))
            if done or (n_kept >= k and theta > ub):
                break
            if consumed * 2 >= total_len:
                return None  # no early proof by half-way
            fresh = []
            for i, (ld, ls) in enumerate(lists):
                c = cursors[i]
                if c >= ld.size:
                    continue
                take = ld[c : c + batch]
                cursors[i] = c + take.size
                consumed += take.size
                nw = take[~seen[take]]
                seen[nw] = True
                fresh.append(nw)
            if not fresh:
                continue
            cand = np.concatenate(fresh)
            if mask is not None:
                cand = cand[mask[cand]]  # tree match check before scoring
            if cand.size:
                cand = np.sort(cand)
                cs = self._dense_scores_at(node, cand)
                keep = np.ones(cand.size, dtype=bool)
                if self._deleted.size:
                    keep &= ~_sorted_isin(cand, self._deleted)
                if after is not None:
                    keep &= _cursor_mask(cand, cs, after)
                kept_d.append(cand[keep])
                kept_s.append(cs[keep])
                n_kept += int(keep.sum())
                pool = np.concatenate([pool, cs[keep]])
                if pool.size > k > 0:
                    pool = np.partition(pool, -k)[-k:]
            if n_kept >= k and 0 < k <= pool.size:
                theta = float(pool.min())
        if not kept_d:
            return []
        docs = np.concatenate(kept_d)
        scores = np.concatenate(kept_s)
        return _topk_hits(docs, scores, k)

    # -------------------------------------------- pruned top-level OR
    def _mostly_undecoded(self, terms: list[str]) -> bool:
        total = sum(len(self._tp(t).blocks) for t in terms)
        cached = sum(len(self._tp(t)._decoded) for t in terms)
        return total > 0 and cached < total // 2

    def _block_ubs(self, tp: "_TermPostings", wv: float) -> np.ndarray:
        """Sound per-block score upper bounds from (max_tf, min_ntab):
        BM25: score <= wv * mt / (mt + k1*((1-b) + b*min_ntab/avgdl));
        classic: score <= sqrt(mt) * wv / sqrt(min_ntab) (the classic
        norm is byte315ToFloat(b) = 1/sqrt(BM25 table value), monotone
        decreasing in ntab, so min_ntab gives the max norm).  Both
        stored values are avgdl/idf-independent so the bound holds under
        NRT stat drift; the 1+1e-6 guard covers float32-vs-float64
        rounding of true scores against the float64 bound."""
        mt = np.array([b["max_tf"] for b in tp.blocks], dtype=np.float64)
        mn = np.array([b["min_ntab"] for b in tp.blocks], dtype=np.float64)
        if self.similarity == "classic":
            with np.errstate(divide="ignore"):
                ub = np.sqrt(mt) * wv / np.sqrt(mn)
            return ub * (1.0 + 1e-6)
        if self.similarity == "lmjm":
            # score rises with tf and falls with docLen (min_ntab IS
            # the block's min decoded docLen — same 1/f^2 table); wv
            # carries the term's pc
            lam = self.lmjm_lambda
            with np.errstate(divide="ignore"):
                ub = np.log1p(((1.0 - lam) * mt / mn) / (lam * float(wv)))
            return ub * (1.0 + 1e-6)
        c = float(self.k1) * (
            (1.0 - float(self.b)) + float(self.b) * mn / float(self.avgdl)
        )
        return wv * mt / (mt + c) * (1.0 + 1e-6)

    def _masked_kth(self, docs_list, scores_list, k, after) -> float:
        """theta = k-th best COLLECTABLE score so far: cursor-passing
        (searchAfter pages compete only past the cursor,
        search/IndexSearcher.java:411-446) and live (deleted docs never
        enter the collector, like liveDocs).  A theta seeded from a
        non-collectable doc would over-prune real results."""
        scs = np.concatenate(scores_list)
        if after is not None or self._deleted.size:
            docs = np.concatenate(docs_list)
            keep = np.ones(docs.size, dtype=bool)
            if self._deleted.size:
                keep &= ~_sorted_isin(docs, self._deleted)
            if after is not None:
                keep &= _cursor_mask(docs, scs, after)
            scs = scs[keep]
        return _kth_best(scs, k)

    def _search_term_pruned(self, term: str, k: int, after=None
                            ) -> tuple[np.ndarray, np.ndarray]:
        """Block-max pruned single-term top-k: decode blocks in
        descending upper-bound order and stop as soon as the next bound
        cannot beat theta — a hot term's tail blocks never decode
        (the single-scorer analogue of BlockMaxWAND; cf. Lucene 8's
        block-max TopScoreDocCollector early exit)."""
        tp = self._tp(term)
        wv = self._term_wv(tp)
        ubs = self._block_ubs(tp, float(wv))
        order = np.argsort(-ubs, kind="stable")
        kept_d: list[np.ndarray] = []
        kept_s: list[np.ndarray] = []
        # theta via a BOUNDED top-k pool updated per block (O(128+k)
        # each) — re-partitioning the full kept concatenation per block
        # was O(blocks * kept) and dominated the COLD first query of a
        # hot term (1.3 s of np.partition for a df=172k term at sf0.1)
        pool = np.empty(0, dtype=np.float32)
        theta = -np.inf
        for n_done, bi in enumerate(order):
            if ubs[bi] < theta:
                break  # bounds are descending: nothing below competes
            if (n_done == 32
                    and np.count_nonzero(ubs < theta) * 4 < ubs.size):
                # pruning is not biting (flat per-block bounds: theta
                # can skip < 1/4 of the blocks after a 32-block probe):
                # the batched full decode + one vectorized score pass
                # beats per-block python for the rest — exhaustive is
                # exact, so this is purely a cost choice
                docs, tfs, norms = tp.decode_all()
                return docs, self._score_arrays(tfs, norms, wv)
            docs, tfs, norms = tp.decode(int(bi))
            scs = self._score_arrays(tfs, norms, wv)
            kept_d.append(docs)
            kept_s.append(scs)
            cand = scs
            if self._deleted.size or after is not None:
                keep = np.ones(docs.size, dtype=bool)
                if self._deleted.size:
                    keep &= ~_sorted_isin(docs, self._deleted)
                if after is not None:
                    keep &= _cursor_mask(docs, scs, after)
                cand = scs[keep]
            pool = np.concatenate([pool, cand])
            if pool.size > k > 0:
                pool = np.partition(pool, -k)[-k:]
            theta = (float(pool.min())
                     if 0 < k <= pool.size else -np.inf)
        return np.concatenate(kept_d), np.concatenate(kept_s)

    def _search_or_pruned(self, terms: list[str], k: int, after=None
                          ) -> tuple[np.ndarray, np.ndarray]:
        """Block-max pruned evaluation of a flat OR of terms."""
        tps = [self._tp(t) for t in terms]
        wvs = np.array(
            [self._term_wv(tp) for tp in tps], dtype=np.float64
        )
        gmax = np.array(
            [
                self._block_ubs(tp, wvs[i]).max() if tp.blocks else 0.0
                for i, tp in enumerate(tps)
            ],
            dtype=np.float64,
        )
        # establish theta from the highest-impact term, fully scored with
        # complete (all-term) scores for its docs
        seed = int(np.argmax(gmax))
        cand, _ = self._term_full(terms[seed])
        scores = self._complete_scores(terms, np.unique(cand))
        kept_docs = [scores[0]]
        kept_scores = [scores[1]]
        theta = self._masked_kth(kept_docs, kept_scores, k, after)
        for i, (t, tp) in enumerate(zip(terms, tps)):
            if i == seed:
                continue
            others = float(gmax.sum() - gmax[i])
            ub = self._block_ubs(tp, wvs[i]) + others
            live = np.flatnonzero(ub >= theta) if theta > -np.inf else np.arange(len(tp.blocks))
            docs, _, _ = tp.decode_blocks(live)
            fresh = np.setdiff1d(docs, np.concatenate(kept_docs), assume_unique=False)
            if fresh.size:
                fd, fscores = self._complete_scores(terms, fresh)
                kept_docs.append(fd)
                kept_scores.append(fscores)
                theta = self._masked_kth(kept_docs, kept_scores, k, after)
        docs = np.concatenate(kept_docs)
        scs = np.concatenate(kept_scores)
        docs, ix = np.unique(docs, return_index=True)
        return docs, scs[ix]

    def _complete_scores(self, terms: list[str], docs: np.ndarray
                         ) -> tuple[np.ndarray, np.ndarray]:
        """Exact full OR scores for the given sorted candidate docs,
        decoding blocks on demand (term contributions in clause order,
        double accumulate, float32 cast)."""
        total = np.zeros(docs.size, dtype=np.float64)
        for t in terms:
            cd, cs = self._term_lookup(t, docs)
            idx = np.searchsorted(docs, cd)
            total[idx] += cs.astype(np.float64)
        return docs, total.astype(np.float32)

    # ------------------------------------------------------------- api
    def explain(self, query, doc_id: int) -> dict:
        """Score explanation for one document — the
        IndexSearcher.explain / Explanation surface
        (search/IndexSearcher.java:670-700, similarities/
        BM25Similarity.java explainScore): a nested dict with the node's
        value, match flag and per-component details; term leaves expose
        the BM25 inputs (df, idf, tf, norm byte, avgdl).  The value at
        every node is computed by the REAL evaluation path, so
        explain(q, d)['value'] equals the score search(q) returns for d."""
        node = parse_query(query, opts=self.analyzer_opts) if isinstance(query, str) else query
        node = self.rewrite(node)
        if node is None or node[0] == "matchnone":
            return {"match": False, "value": None,
                    "description": "MatchNoDocsQuery"}
        self._load_terms(self._collect_terms(node))
        self._eval_memo = {}
        return self._explain_node(node, int(doc_id))

    def _node_value(self, node, doc: int):
        docs, scores = self._eval(node)
        i = int(np.searchsorted(docs, doc))
        if i < docs.size and docs[i] == doc:
            return float(scores[i])
        return None

    def _explain_node(self, node, doc: int) -> dict:
        kind = node[0]
        val = self._node_value(node, doc)
        out: dict = {"match": val is not None, "value": val}
        if kind == "term":
            tp = self._tp(node[1])
            df = tp.n_docs
            idf = float(self._idf(df))
            sim = {
                "classic": "ClassicSimilarity",
                "lmd": "LMDirichletSimilarity",
                "lmjm": "LMJelinekMercerSimilarity",
                "dfr": "DFRSimilarity(I(n)L2)",
                "ib": "IBSimilarity(LL-D2)",
                "dfi": "DFISimilarity(ChiSquared)",
                "ax": "AxiomaticF2EXP",
                "bool": "BooleanSimilarity",
            }.get(self.similarity, "BM25Similarity")
            out["description"] = f"weight(text:{node[1]}) [{sim}]"
            detail = {"docFreq": df, "docCount": self.doc_count, "idf": idf,
                      "k1": float(self.k1), "b": float(self.b),
                      "avgdl": float(self.avgdl)}
            docs, tfs, norms = tp.decode_all()
            i = int(np.searchsorted(docs, doc))
            if i < docs.size and docs[i] == doc:
                detail["freq"] = int(tfs[i])
                detail["norm_byte"] = int(norms[i])
                detail["norm_decoded"] = float(NORM_TABLE[norms[i]])
            out["details"] = [detail]
            return out
        if kind == "fterm":
            tp = self._tp(node[2], node[1])
            dc_f = int(self.fstats.get(node[1], {}).get("doc_count", 0))
            out["description"] = (
                f"weight({node[1]}:{node[2]}) [omitNorms StringField]"
            )
            out["details"] = [{"docFreq": tp.n_docs, "docCount": dc_f,
                               "norm": float(self.k1)}]
            return out
        labels = {
            "and": "sum of (MUST):", "or": "sum of (SHOULD):",
            "msm_or": "sum of matching SHOULD (minShouldMatch):",
            "andnot": "MUST_NOT-filtered:", "reqopt": "required+optional:",
            "reqfilter": "FILTER-restricted:", "filter0": "FILTER only:",
            "boost": "boost product:", "phrase": "phrase(sum idf):",
            "const_or": "ConstantScore(expanded terms):",
            "tsrange": "PointRangeQuery(ts):",
        }
        out["description"] = labels.get(kind, kind)
        if kind in ("and", "or"):
            out["details"] = [self._explain_node(c, doc) for c in node[1]]
        elif kind == "msm_or":
            out["minShouldMatch"] = node[1]
            out["details"] = [self._explain_node(c, doc) for c in node[2]]
        elif kind in ("andnot", "reqopt", "reqfilter"):
            out["details"] = [self._explain_node(node[1], doc),
                              self._explain_node(node[2], doc)]
        elif kind == "boost":
            out["boost"] = float(node[2])
            out["details"] = [self._explain_node(node[1], doc)]
        elif kind == "filter0":
            out["details"] = [self._explain_node(node[1], doc)]
        elif kind == "phrase":
            out["clauses"] = [list(c) for c in node[1]]
            if len(node) > 2:
                out["slop"] = node[2]
        return out

    def search_after(self, query, after: tuple[int, float],
                     k: int = 10) -> list[tuple[int, float]]:
        """Keyset pagination (IndexSearcher.searchAfter,
        search/IndexSearcher.java:411-446): the next page strictly after
        cursor `after` = (doc_id, score) in (score desc, docID asc)
        order — keep docs with score < after.score, or equal score and
        docID > after.doc.  The cursor threads into collection (pruning
        theta and top-k selection), so a page fetch decodes only
        competitive blocks instead of materializing the full ranking."""
        return self.search(query, k=k, after=after)

    def search(self, query, k: int | None = 10, after=None
               ) -> list[tuple[int, float]]:
        """Top-k hits as (doc_id, float32 score); k=None returns ALL
        matches in (score desc, docID asc) order (the searchAfter base).
        `after` = (doc_id, score) cursor restricts hits to those strictly
        after it in rank order."""
        node = parse_query(query, opts=self.analyzer_opts) if isinstance(query, str) else query
        node = self.rewrite(node)
        if node is None or node[0] == "matchnone":
            return []
        terms = self._collect_terms(node)
        self._load_terms(terms)
        self._eval_memo: dict = {}
        pruned_terms = None
        if self.pruning and k is not None and self._fastpaths:
            if node[0] == "term":
                pruned_terms = [node[1]]
            elif (
                node[0] == "or"
                and all(c[0] == "term" for c in node[1])
                and len(set(t for _, t in node[1])) == len(node[1])
            ):
                pruned_terms = [t for _, t in node[1]]
        if pruned_terms and self._mostly_undecoded(pruned_terms):
            # cold lists: block-max pruning avoids decoding
            # never-competitive blocks.  Warm lists (decode cache full)
            # score faster through the vectorized flat-OR path — the
            # cost-based strategy choice Lucene makes in
            # BooleanWeight.bulkScorer (windowed BooleanScorer vs
            # per-doc scorers).
            if len(pruned_terms) == 1:
                docs, scores = self._search_term_pruned(
                    pruned_terms[0], k, after=after
                )
            else:
                docs, scores = self._search_or_pruned(
                    pruned_terms, k, after=after
                )
        else:
            if node[0] == "term" and k is not None and self._fastpaths:
                hits = self._search_term_topcand(node[1], k, after=after)
                if hits is not None:
                    return hits
            if (node[0] in ("and", "or", "msm_or") and k is not None
                    and self._fastpaths):
                # warm boolean tree: threshold-algorithm early
                # termination over cached score-descending leaf lists
                hits = self._search_tree_ta(node, k, after=after)
                if hits is not None:
                    return hits
            docs, scores = self._eval(node)
        return _topk_hits(docs, scores, k, after=after,
                          deleted=self._deleted)


def _kth_best(scores: np.ndarray, k: int) -> float:
    if scores.size < k:
        return -np.inf
    return float(np.partition(scores, -k)[-k])


def _sorted_isin(values: np.ndarray, sorted_unique: np.ndarray) -> np.ndarray:
    """Membership of `values` in a SORTED-UNIQUE array — O(n log m)
    searchsorted, avoiding np.isin's internal sort of both inputs (our
    posting doc arrays are always sorted and unique)."""
    if sorted_unique.size == 0:
        return np.zeros(values.size, dtype=bool)
    idx = np.searchsorted(sorted_unique, values)
    idx[idx == sorted_unique.size] = sorted_unique.size - 1
    return sorted_unique[idx] == values


def _cursor_mask(docs: np.ndarray, scores: np.ndarray,
                 after: tuple[int, float]) -> np.ndarray:
    """Docs strictly after the (doc_id, score) cursor in (score desc,
    docID asc) order."""
    a_doc, a_score = int(after[0]), np.float32(after[1])
    return (scores < a_score) | ((scores == a_score) & (docs > a_doc))


def _topk_hits(docs: np.ndarray, scores: np.ndarray,
               k: int | None, after=None,
               deleted: np.ndarray | None = None) -> list[tuple[int, float]]:
    """(score desc, docID asc) top-k without a full sort: partition on
    the k-th score, lexsort only the surviving candidates (incl. ties at
    the threshold so the docID tie-break is exact —
    HitQueue.java:76-81).  `after` filters to docs strictly after the
    cursor before selection (searchAfter); `deleted` masks tombstoned
    docs (liveDocs at collection time)."""
    if deleted is not None and deleted.size and docs.size:
        keep = ~_sorted_isin(docs, deleted)
        docs, scores = docs[keep], scores[keep]
    if after is not None and docs.size:
        keep = _cursor_mask(docs, scores, after)
        docs, scores = docs[keep], scores[keep]
    if docs.size == 0:
        return []
    if k is not None and 0 < k < docs.size:
        kth = np.partition(scores, docs.size - k)[docs.size - k]
        keep = np.flatnonzero(scores >= kth)
        docs, scores = docs[keep], scores[keep]
    order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
    return [(int(docs[i]), float(scores[i])) for i in order]
