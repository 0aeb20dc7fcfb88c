"""SimilarityBase-family query-time similarities (round 4).

Five more scoring models over the SAME index and the SAME norm byte —
query-time switchable with no reindex, exactly the reference's
``IndexSearcher.setSimilarity`` contract:

- ``dfr``  — DFRSimilarity(BasicModelIn, AfterEffectL, NormalizationH2(c=1)),
  i.e. the classic "I(n)L2" divergence-from-randomness configuration:
  score = boost * (tfn * log2((N+1)/(n+0.5))) * (1/(tfn+1)) with
  tfn = tf * log2(1 + avgdl/dl)
  (similarities/DFRSimilarity.java:110-114, BasicModelIn.java:33-37,
  AfterEffectL.java:32-34, NormalizationH2.java:52-54).
- ``ib``   — IBSimilarity(DistributionLL, LambdaDF, NormalizationH2(c=1)),
  "IB LL-D2": score = -ln(lambda/(tfn+lambda)),
  lambda = (df+1)/(N+1)
  (IBSimilarity.java:98-104, DistributionLL.java:33-35,
  LambdaDF.java:31-34).
- ``dfi``  — DFISimilarity(IndependenceChiSquared): expected =
  (ttf+1)*dl/(sttf+1); score = 0 when tf <= expected, else
  log2((tf-expected)^2/expected + 1)
  (DFISimilarity.java:53-64, IndependenceChiSquared.java:36-39).
- ``ax``   — AxiomaticF2EXP(s=0.25, k=0.35):
  score = tf/(tf + s + s*dl/avgdl) * ((N+1)/df)^k
  (Axiomatic.java:101-107, AxiomaticF2EXP.java:58-88).
- ``bool`` — BooleanSimilarity: score = boost (tf/stats-independent;
  norms are still written BM25-style so the model can be switched
  after indexing — BooleanSimilarity.java:30-72).

All five are SimilarityBase subclasses in the reference:
``score(stats, freq, docLen)`` with docLen decoded from the shared
norm byte (1/f^2 — the same table the BM25/LM paths use,
SimilarityBase.java:220-227).  Multi-term (phrase/span) weights carry
per-clause (docFreq, totalTermFreq) pairs and sum the per-clause
float32 scores at the shared freq (MultiSimilarity.MultiSimScorer),
the same discipline the LM family already uses here.

Serving mode follows the reference's float discipline: Java float
(float32) arithmetic with Math.log/log2/pow evaluated in double and
cast back to float at each expression boundary.  Gate mode (float64)
is all-double with the EXACT document length from the docmap — the
same deviation discipline as bm25/lmd — so an ANSI-SQL twin is
bit-stable against it.

Fast paths: dfr/ib/ax scores are strictly positive but the block
upper bounds are per-(df,ttf)-tuple rather than a scalar weight, and
``dfi`` can score a present posting exactly 0 (tf <= expected), so —
like ``lmd`` — all five run the exhaustive evaluator.  These models
are correctness breadth; BM25 stays the serving-latency headline.
"""
from __future__ import annotations

import math

import numpy as np

from ..oracle.smallfloat import NORM_TABLE

#: similarities implemented by this module (SimilarityBase family)
SIMBASE = ("dfr", "ib", "dfi", "ax", "bool")

_LN2 = math.log(2.0)

#: AxiomaticF2EXP defaults (Axiomatic.java:96-99)
AX_S = 0.25
AX_K = 0.35

F32_1 = np.float32(1.0)
F32_0 = np.float32(0.0)


def _tfn_h2_f32(freq: np.ndarray, dl: np.ndarray,
                avgdl: np.float32) -> np.ndarray:
    """NormalizationH2.tfn (c=1), Java float discipline:
    ``(float)(tf * log2(1 + c*avgdl/len))`` — the ``c*avgdl/len``
    ratio and the ``1 +`` are float32 (Java float arithmetic), the
    log2 and the product with tf are double, cast back to float."""
    inner = (F32_1 + (avgdl / dl).astype(np.float32)).astype(np.float32)
    return (
        freq.astype(np.float64) * (np.log(inner.astype(np.float64)) / _LN2)
    ).astype(np.float32)


def _clause_f32(sim: str, freq: np.ndarray, dl: np.ndarray,
                df: int, ttf: int, doc_count: int, sum_ttf: int,
                avgdl: np.float32) -> np.ndarray:
    """One clause's float32 scores at `freq` occurrences in docs of
    decoded length `dl` (both arrays), serving-mode float discipline.
    df is clamped >= 1: the reference only builds a SimScorer for
    terms that exist (TermStates), so df = 0 never reaches a formula;
    our distributed fterm path computes the constant unconditionally."""
    df = max(df, 1)
    if sim == "bool":
        # BooleanSimilarity.score = boost (BooleanSimilarity.java:69-72)
        return np.full(freq.size, F32_1, dtype=np.float32)
    if sim == "dfi":
        # expected = (ttf+1)*docLen/(sttf+1): long*float/long — all
        # float32 in Java (DFISimilarity.java:55).  The float32
        # multiply can overflow to inf for extreme ttf*dl — Java float
        # arithmetic overflows to Infinity IDENTICALLY, so the numpy
        # RuntimeWarning is the faithful behavior, not a defect;
        # silence it so property tests don't flag it.
        with np.errstate(over="ignore", invalid="ignore"):
            expected = (
                (np.float32(ttf + 1) * dl).astype(np.float32)
                / np.float32(sum_ttf + 1)
            ).astype(np.float32)
            d = (freq - expected).astype(np.float32)
            measure = (d * d / expected).astype(np.float32)
        s = (
            np.log((measure + F32_1).astype(np.float64)) / _LN2
        ).astype(np.float32)
        return np.where(freq <= expected, F32_0, s)
    if sim == "ax":
        s_c = np.float32(AX_S)
        # freq + s + s*docLen/avgdl: Java float ops left-to-right
        denom = (
            (freq + s_c).astype(np.float32)
            + ((s_c * dl).astype(np.float32) / avgdl).astype(np.float32)
        ).astype(np.float32)
        tfln = (freq / denom).astype(np.float32)
        # (float) Math.pow((N + 1.0) / df, k) — double pow, float cast
        idf = np.float32(math.pow((doc_count + 1.0) / df, AX_K))
        return (tfln * idf).astype(np.float32)
    tfn = _tfn_h2_f32(freq, dl, avgdl)
    if sim == "dfr":
        # BasicModelIn: tfn * (float)(log2((N+1)/(n+0.5)))
        i_n = np.float32(math.log((doc_count + 1) / (df + 0.5)) / _LN2)
        basic = (tfn * i_n).astype(np.float32)
        # AfterEffectL: 1/(tfn+1), float
        ae = (F32_1 / (tfn + F32_1)).astype(np.float32)
        return (basic * ae).astype(np.float32)
    # ib: lambda = (df+1F)/(N+1F) float; DistributionLL:
    # (float)-Math.log(lambda/(tfn+lambda)) — the ratio is FLOAT
    # division (both operands float), the log double
    lam = np.float32(np.float32(df + 1.0) / np.float32(doc_count + 1.0))
    x = (lam / (tfn + lam)).astype(np.float32)
    return (-np.log(x.astype(np.float64))).astype(np.float32)


def serving_scores(sim: str, freq: np.ndarray, norms: np.ndarray | None,
                   weights, doc_count: int, sum_ttf: int,
                   avgdl: np.float32, dl: np.ndarray | None = None
                   ) -> np.ndarray:
    """float32 serving-mode scores: `freq` float32 occurrences, docLen
    decoded from the norm byte (``NORM_TABLE[norms]``, 1/f^2 —
    SimilarityBase.java:220-227) unless an explicit `dl` override is
    given (omitNorms fields: norms == null -> docLen = 1F).  `weights`
    is a list of per-clause (doc_freq, total_term_freq) pairs; clause
    scores are summed in float32 (MultiSimilarity.MultiSimScorer)."""
    if dl is None:
        dl = NORM_TABLE[norms]
    total = np.zeros(freq.size, dtype=np.float32)
    for df, ttf in weights:
        total = (
            total + _clause_f32(sim, freq, dl, int(df), int(ttf),
                                doc_count, sum_ttf, avgdl)
        ).astype(np.float32)
    return total


def gate_scores(sim: str, freq: np.ndarray, dl: np.ndarray, weights,
                doc_count: int, sum_ttf: int) -> np.ndarray:
    """All-double gate-mode scores with EXACT docmap doc length —
    operation-ordered to be bit-stable against the ANSI-SQL twins in
    ``oracle_sql_score`` (avgdl = sttf/N in double)."""
    avgdl = sum_ttf / float(doc_count)
    fq = freq.astype(np.float64)
    dl = dl.astype(np.float64)
    total = np.zeros(fq.size, dtype=np.float64)
    for df, ttf in weights:
        df, ttf = max(int(df), 1), int(ttf)
        if sim == "bool":
            total += 1.0
            continue
        if sim == "dfi":
            expected = (ttf + 1.0) * dl / (sum_ttf + 1.0)
            d = fq - expected
            s = np.log(d * d / expected + 1.0) / _LN2
            total += np.where(fq <= expected, 0.0, s)
            continue
        if sim == "ax":
            total += (
                fq / (fq + AX_S + AX_S * dl / avgdl)
                * math.pow((doc_count + 1.0) / df, AX_K)
            )
            continue
        tfn = fq * (np.log(1.0 + avgdl / dl) / _LN2)
        if sim == "dfr":
            i_n = math.log((doc_count + 1) / (df + 0.5)) / _LN2
            total += tfn * i_n / (tfn + 1.0)
        else:  # ib
            lam = (df + 1.0) / (doc_count + 1.0)
            total += -np.log(lam / (tfn + lam))
    return total


def gate_sql_col(sim: str, doc_count: int, sum_ttf: int):
    """Spark Column for the float64 gate single-term plan: score from
    columns ``tf`` (int), ``dl`` (long), ``doc_freq``,
    ``total_term_freq`` — the same double operation order as
    ``gate_scores`` / the DuckDB twins."""
    from pyspark.sql import functions as F

    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    df = F.col("doc_freq").cast("double")
    ttf = F.col("total_term_freq").cast("double")
    avgdl = sum_ttf / float(doc_count)
    if sim == "bool":
        return F.lit(1.0)
    if sim == "dfi":
        expected = (ttf + F.lit(1.0)) * dl / F.lit(sum_ttf + 1.0)
        d = tf - expected
        s = F.log(d * d / expected + F.lit(1.0)) / F.lit(_LN2)
        return F.when(tf <= expected, F.lit(0.0)).otherwise(s)
    if sim == "ax":
        return (
            tf / (tf + F.lit(AX_S) + F.lit(AX_S) * dl / F.lit(avgdl))
            * F.pow(F.lit(doc_count + 1.0) / df, F.lit(AX_K))
        )
    tfn = tf * (F.log(F.lit(1.0) + F.lit(avgdl) / dl) / F.lit(_LN2))
    if sim == "dfr":
        i_n = (
            F.log(F.lit(float(doc_count + 1)) / (df + F.lit(0.5)))
            / F.lit(_LN2)
        )
        return tfn * i_n / (tfn + F.lit(1.0))
    # ib
    lam = (df + F.lit(1.0)) / F.lit(doc_count + 1.0)
    return -F.log(lam / (tfn + lam))


def oracle_sql_score(sim: str) -> str:
    """DuckDB score expression for the gate oracles, over the shared
    tokenization CTE columns ``tf``, ``dl``, ``ts.doc_freq``,
    ``ts.ttf`` and field-stats scalars ``fs.doc_count``/``fs.sttf``
    (avgdl = fs.sttf / fs.doc_count in double) — operation-for-
    operation the twin of ``gate_scores``/``gate_sql_col``."""
    avgdl = "(fs.sttf * 1.0 / fs.doc_count)"
    if sim == "bool":
        return "1.0"
    if sim == "dfi":
        exp = "((ts.ttf + 1.0) * dl / (fs.sttf + 1.0))"
        return (
            f"CASE WHEN tf <= {exp} THEN 0.0 ELSE "
            f"LN((tf - {exp}) * (tf - {exp}) / {exp} + 1.0) / LN(2.0) END"
        )
    if sim == "ax":
        return (
            f"tf / (tf + {AX_S} + {AX_S} * dl / {avgdl})"
            f" * POWER((fs.doc_count + 1.0) / ts.doc_freq, {AX_K})"
        )
    tfn = f"(tf * (LN(1.0 + {avgdl} / dl) / LN(2.0)))"
    if sim == "dfr":
        return (
            f"{tfn} * (LN((fs.doc_count + 1.0) / (ts.doc_freq + 0.5))"
            f" / LN(2.0)) / ({tfn} + 1.0)"
        )
    # ib
    lam = "((ts.doc_freq + 1.0) / (fs.doc_count + 1.0))"
    return f"-LN({lam} / ({tfn} + {lam}))"
