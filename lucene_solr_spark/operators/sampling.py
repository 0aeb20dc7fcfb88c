"""Deterministic sampling operators — the RandomStream role
(solrj io/stream/RandomStream.java returns a pseudo-random slice of a
result set) done reproducibly, plus the stratified variant a
training-data pipeline needs for class-balanced corpus construction.

Spark's own `df.sample()` is partition-layout-dependent (same seed,
different partitioning => different rows); these operators key the
coin flip on ROW CONTENT (md5 of the key columns + seed), so a sample
is reproducible across cluster sizes, AQE re-plans, and engines — the
DuckDB twin computes the identical md5 arithmetic, which is what makes
the gates hash-checkable.

Scale: one narrow projection + filter per sample — no shuffle, no
driver state; the filter sits directly on the scan."""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: md5-prefix denominator: first 8 hex chars as a uniform int in
#: [0, 16^8)
_DEN = 16 ** 8


def _coin(key_cols, seed: int):
    """Uniform [0,1) from md5(key||'#'||seed) — content-keyed, engine-
    portable (DuckDB: md5(), same substring arithmetic)."""
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    h = F.md5(F.concat(key, F.lit(f"#{seed}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(
        float(_DEN)
    )


def deterministic_sample(df: DataFrame, p: float, key_cols,
                         seed: int = 42) -> DataFrame:
    """Keep each row with probability `p`, decided by a content hash —
    the same rows survive under ANY partitioning or engine."""
    return df.filter(_coin(key_cols, seed) < float(p))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict, key_cols,
                      seed: int = 42) -> DataFrame:
    """Per-stratum sampling fractions (class-balancing): rows of
    stratum s survive with probability fractions[s] (absent strata
    drop).  One CASE expression over the same content coin — still a
    single narrow filter."""
    frac = None
    for s, p in sorted(fractions.items()):
        cond = F.col(strata_col) == F.lit(s)
        frac = (F.when(cond, F.lit(float(p))) if frac is None
                else frac.when(cond, F.lit(float(p))))
    frac = frac.otherwise(F.lit(0.0))
    return df.filter(_coin(key_cols, seed) < frac)
