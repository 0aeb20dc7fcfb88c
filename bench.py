"""Benchmark harness (driver-run per round; also writes BENCH/BASELINE.md).

Measures, per BASELINE.json metric:
  - index-build throughput (turns/sec) over a MATERIALIZED parquet
    transcript corpus (input_hint: the input is an existing table, so
    corpus synthesis is not part of indexing throughput),
  - scaling efficiency between two parallelism levels on the SAME input
    (the sandbox substitute for N vs 4N executors, per driver
    instruction).  The default pair is local[2] -> local[8]: a raw
    multiprocessing capacity probe (reported in the output) shows this
    host delivers only ~16 cores of real CPU capacity (32 burner
    processes produce the same aggregate throughput as 16), so both
    levels must sit well inside that budget for the comparison to
    measure the ENGINE's scaling rather than host saturation.  Each timed build
    is preceded by a small warmup build in the same JVM (JIT + Python
    worker spin-up), standard JVM benchmarking practice.
  - top-k BM25 query latency over the reference query set (warm serving
    path), p95 + per-query seconds.

Prints ONE JSON line:
  {"metric": "index_build_turns_per_sec", "value": <turns/sec at CPUS>,
   "unit": "turns/sec", "queries": {name: sec, ...}, "sf": <sf>, ...extras}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") == "1"
LOW_CORES = int(os.environ.get("SPARK_GRAFT_LOW_CORES", "2"))
HIGH_CORES = int(os.environ.get("SPARK_GRAFT_HIGH_CORES", "8"))
#: corpus for the scaling pair: big enough that parallel work dominates
#: fixed per-build overhead (JVM job scheduling, range-sample job,
#: parquet commit protocol) — at 3M turns the 2-core build is ~95%
#: compute.  The host's noisy-neighbor variance (capacity probes on the
#: SAME day differ by ~25%) dwarfs any corpus-size effect, so the noise
#: answer is repeats+min (below), not a bigger corpus.
SCALE_TURNS = int(os.environ.get("SPARK_GRAFT_SCALE_TURNS", "3000000"))

_TURNS_BY_SF = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}
_TURNS_PER_CONV = 22.5  # E[n_turns] of the generator


def _sf_tag() -> str:
    return os.path.basename(os.path.normpath(SF_DIR))


def _sf_value(tag: str) -> float:
    try:
        return float(tag.replace("sf", ""))
    except ValueError:
        return 0.1


# ------------------------------------------------------ capacity probe


def _burn(_):
    import numpy as np

    x = np.arange(1_000_000, dtype=np.float64)
    t0 = time.time()
    n = 0
    while time.time() - t0 < 3:
        (np.sqrt(x) * 1.0001).sum()
        n += 1
    return n


def probe_capacity(proc_counts: list[int]) -> dict[int, int]:
    """Aggregate numpy throughput at each process count — evidence of the
    host's REAL core capacity (saturation point), independent of Spark."""
    out = {}
    for k in proc_counts:
        with mp.Pool(k) as p:
            out[k] = int(sum(p.map(_burn, range(k))))
    return out


# -------------------------------------------------------------- corpus


def materialize_corpus(n_convs: int, corpus_dir: str) -> None:
    """Generate the deterministic transcript corpus to parquet ONCE
    (untimed)."""
    if os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        return
    from lucene_solr_spark.session import get_spark
    from lucene_solr_spark.sources import gen_transcripts_df

    spark = get_spark("lss-bench-gen", cores=CPUS,
                      shuffle_partitions=max(CPUS, 8))
    try:
        gen_transcripts_df(spark, n_convs=n_convs, seed=42,
                           parallelism=CPUS * 4).write.mode(
            "overwrite").parquet(corpus_dir)
    finally:
        spark.stop()


# --------------------------------------------------------------- build


def build_at(cores: int, corpus_dir: str, out_dir: str,
             warmup_dir: str | None = None) -> tuple[float, int]:
    """Build the index at local[cores] from the parquet corpus; returns
    (seconds, n_turns).  A 20k-turn warmup build runs first in the same
    JVM so the timed run measures steady-state throughput."""
    import pyarrow.parquet as pq

    from lucene_solr_spark.index.builder import BuildConfig, build_index
    from lucene_solr_spark.session import get_spark

    shutil.rmtree(out_dir, ignore_errors=True)
    spark = get_spark(f"lss-bench-{cores}", cores=cores,
                      shuffle_partitions=max(cores * 2, 8))
    cfg = BuildConfig(n_buckets=16, partitions=max(cores * 2, 8))
    try:
        if warmup_dir is not None:
            shutil.rmtree(warmup_dir, ignore_errors=True)
            wdf = spark.read.parquet(corpus_dir).limit(20000)
            build_index(spark, wdf, warmup_dir, cfg)
            shutil.rmtree(warmup_dir, ignore_errors=True)
        df = spark.read.parquet(corpus_dir)
        t0 = time.time()
        build_index(spark, df, out_dir, cfg)
        dt = time.time() - t0
        from lucene_solr_spark.index.builder import read_field_stats

        n_turns = read_field_stats(out_dir)["max_doc"]
    finally:
        spark.stop()
    return dt, int(n_turns)


# -------------------------------------------------------------- queries


def query_bench(index_dir: str, repeats: int = 3) -> dict:
    import numpy as np
    import pyarrow.parquet as pq

    from lucene_solr_spark.query.engine import LocalSearcher
    from lucene_solr_spark.sources.queryset import build_query_set

    ts = pq.read_table(os.path.join(index_dir, "term_stats")).to_pandas()
    dfs = dict(zip(ts["term"], ts["doc_freq"]))
    qset = build_query_set(dfs)
    searcher = LocalSearcher(index_dir)
    # warm-up pass (loads + decodes posting blocks)
    for _, q in qset:
        searcher.search(q, 10)
    per_query: dict[str, float] = {}
    all_times: list[float] = []
    for name, q in qset:
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            searcher.search(q, 10)
            times.append(time.perf_counter() - t0)
        per_query[name] = float(np.median(times))
        all_times.extend(times)
    # COLD pass: a FRESH searcher per query, first execution timed —
    # no dense tables, no decode cache, no pre-warming from earlier
    # queries in the set (the warm numbers above can hide cold-path
    # holes because the single-term queries pre-build the hot terms'
    # score tables).  Excludes index-open cost (stats/manifest load).
    cold_times: list[float] = []
    for _, q in qset:
        cs = LocalSearcher(index_dir)
        t0 = time.perf_counter()
        cs.search(q, 10)
        cold_times.append(time.perf_counter() - t0)
    return {
        "per_query": per_query,
        "p95_sec": float(np.percentile(all_times, 95)),
        "p50_sec": float(np.percentile(all_times, 50)),
        "qps": float(len(all_times) / sum(all_times)),
        "cold_p95_sec": float(np.percentile(cold_times, 95)),
        "cold_p50_sec": float(np.percentile(cold_times, 50)),
    }


def main() -> None:
    tag = _sf_tag()
    n_turns_target = _TURNS_BY_SF.get(tag, 200_000)
    n_convs = max(1, round(n_turns_target / _TURNS_PER_CONV))
    work = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/lss_bench")
    os.makedirs(work, exist_ok=True)
    warm = os.path.join(work, "warmup_idx")

    corpus_dir = os.path.join(work, f"corpus_{tag}")
    materialize_corpus(n_convs, corpus_dir)

    hi_dir = os.path.join(work, f"idx_{tag}_c{CPUS}")
    hi_sec, n_turns = build_at(CPUS, corpus_dir, hi_dir, warmup_dir=warm)
    hi_tp = n_turns / hi_sec

    scaling = None
    if SCALING and LOW_CORES != HIGH_CORES:
        capacity = probe_capacity(sorted({LOW_CORES, HIGH_CORES, CPUS}))
        sc_corpus = os.path.join(work, f"corpus_scale_{SCALE_TURNS}")
        materialize_corpus(max(1, round(SCALE_TURNS / _TURNS_PER_CONV)),
                           sc_corpus)
        # best-of-N per level, ABBA interleaved: this host is a shared VM
        # with noisy-neighbor variance (identical builds measured 339s
        # and 396s back-to-back; capacity probes differ ~25% between
        # windows), so a single sample per level can swing the ratio by
        # +-0.15; min-time per level is the standard noise-robust
        # estimator (noise only ever ADDS time) and is symmetric across
        # levels — three repeats give each level three windows to catch
        # a clean run
        repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))
        hi_secs, lo_secs, sc_n = [], [], 0
        for _ in range(repeats):
            sc_hi_dir = os.path.join(work, f"idx_scale_c{HIGH_CORES}")
            s_, sc_n = build_at(HIGH_CORES, sc_corpus, sc_hi_dir,
                                warmup_dir=warm)
            hi_secs.append(s_)
            shutil.rmtree(sc_hi_dir, ignore_errors=True)
            sc_lo_dir = os.path.join(work, f"idx_scale_c{LOW_CORES}")
            s_, _ = build_at(LOW_CORES, sc_corpus, sc_lo_dir,
                             warmup_dir=warm)
            lo_secs.append(s_)
            shutil.rmtree(sc_lo_dir, ignore_errors=True)
        sc_hi_sec, sc_lo_sec = min(hi_secs), min(lo_secs)
        lo_tp, hi2_tp = sc_n / sc_lo_sec, sc_n / sc_hi_sec
        eff = (hi2_tp / lo_tp) / (HIGH_CORES / LOW_CORES)
        scaling = {
            "scale_turns": sc_n,
            "runs_sec": {"low": [round(x, 1) for x in lo_secs],
                         "high": [round(x, 1) for x in hi_secs]},
            "low_cores": LOW_CORES,
            "low_turns_per_sec": round(lo_tp, 1),
            "high_cores": HIGH_CORES,
            "high_turns_per_sec": round(hi2_tp, 1),
            "efficiency": round(eff, 3),
            "capacity_probe_iters": capacity,
        }

    qb = query_bench(hi_dir)

    out = {
        "metric": "index_build_turns_per_sec",
        "value": round(hi_tp, 1),
        "unit": "turns/sec",
        "queries": {k: round(v, 6) for k, v in qb["per_query"].items()},
        "sf": _sf_value(tag),
        "n_turns": n_turns,
        "build_sec": round(hi_sec, 2),
        "query_p95_sec": round(qb["p95_sec"], 6),
        "query_p50_sec": round(qb["p50_sec"], 6),
        "query_qps": round(qb["qps"], 1),
        "query_cold_p95_sec": round(qb["cold_p95_sec"], 6),
        "query_cold_p50_sec": round(qb["cold_p50_sec"], 6),
        "scaling": scaling,
    }
    # BASELINE.md records the headline (sf0.1) numbers only — local
    # runs at other SFs (e.g. sf0.01 while iterating) must not clobber
    # it (VERDICT r3 housekeeping: this file kept going stale-dirty)
    if out["sf"] == 0.1:
        _write_baseline_md(out)
    print(json.dumps(out))


def _write_baseline_md(out: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    s = out.get("scaling") or {}
    lines = [
        "# BENCH/BASELINE.md — measured numbers",
        "",
        f"Headline corpus: {out['n_turns']} synthetic transcript turns "
        f"(deterministic, seed=42), sf tag {out['sf']}; indexing reads a "
        "materialized parquet table (corpus synthesis untimed, per "
        "input_hint the input is an existing table).  Timed builds run "
        "after a 20k-turn warmup build in the same JVM.",
        "",
        "| metric | value |",
        "|---|---|",
        f"| index build (local[{CPUS}]) | {out['value']} turns/sec "
        f"({out['build_sec']} s) |",
    ]
    if s:
        cap = s["capacity_probe_iters"]
        lines += [
            f"| scaling corpus | {s['scale_turns']} turns (same input at "
            "both parallelism levels) |",
            f"| index build (local[{s['low_cores']}]) | "
            f"{s['low_turns_per_sec']} turns/sec |",
            f"| index build (local[{s['high_cores']}]) | "
            f"{s['high_turns_per_sec']} turns/sec |",
            f"| **scaling efficiency** {s['low_cores']}->"
            f"{s['high_cores']} cores (4x) | **{s['efficiency']}** "
            "(target >= 0.8 per north_rule; sandbox substitute for N vs "
            "4N executors) |",
        ]
    lines += [
        f"| query p50 | {out['query_p50_sec'] * 1000:.2f} ms |",
        f"| query p95 | {out['query_p95_sec'] * 1000:.2f} ms |",
        f"| query p95 COLD (fresh searcher per query, first run) "
        f"| {out['query_cold_p95_sec'] * 1000:.2f} ms |",
        f"| query throughput | {out['query_qps']} q/s |",
        "",
        "Query set: FIXTURES.md §4 reference set (53 boolean AND/OR "
        "queries, k=10), warm serving path, median of 3 runs per query.",
    ]
    if s:
        cap = {int(k): v for k, v in s["capacity_probe_iters"].items()}
        cap_s = ", ".join(f"{k} procs -> {v}" for k, v in sorted(cap.items()))
        eff_cores = 2 * cap.get(32, 0) / max(cap.get(2, 1), 1)
        lines += [
            "",
            f"## Why the scaling pair is {s['low_cores']} -> "
            f"{s['high_cores']} cores",
            "",
            "A Spark-free multiprocessing probe (3s of vectorized numpy per "
            f"process) measures aggregate host throughput: {cap_s} "
            "iterations — this window the host delivered ~"
            f"{eff_cores:.0f} effective cores of the advertised 32 vCPUs "
            "(the shared VM's effective capacity varies between ~16 and "
            "~23 cores across same-day probe windows).  Both levels of "
            "the N -> 4N pair must sit inside the WORST-CASE real budget "
            "for the comparison to measure the ENGINE's scaling rather "
            f"than host saturation — hence local[{s['low_cores']}] -> "
            f"local[{s['high_cores']}].  local[32] numbers measure "
            "oversubscription, not scaling.  Per-level times are "
            "best-of-3 ABBA-interleaved repeats (noise only ever adds "
            "time; the spread across identical runs is visible in the "
            "runs_sec lists of BENCH_r JSON).",
        ]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    sys.exit(main())
