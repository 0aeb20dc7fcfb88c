"""Benchmark harness (driver-run per round; also writes BENCH/BASELINE.md).

Measures, per BASELINE.json metric:
  - index-build throughput (turns/sec) at local[CPUS] and local[8] on the
    SAME synthetic transcript corpus -> scaling efficiency (the sandbox
    substitute for N vs 4N executors, per driver instruction),
  - top-k BM25 query latency over the reference query set (warm serving
    path), p95 + per-query seconds.

Prints ONE JSON line:
  {"metric": "index_build_turns_per_sec", "value": <turns/sec at CPUS>,
   "unit": "turns/sec", "queries": {name: sec, ...}, "sf": <sf>, ...extras}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") == "1"
LOW_CORES = int(os.environ.get("SPARK_GRAFT_LOW_CORES", "8"))

_TURNS_BY_SF = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}


def _sf_tag() -> str:
    return os.path.basename(os.path.normpath(SF_DIR))


def _sf_value(tag: str) -> float:
    try:
        return float(tag.replace("sf", ""))
    except ValueError:
        return 0.1


def build_at(cores: int, n_convs: int, out_dir: str) -> tuple[float, int]:
    """Build the index at local[cores]; returns (seconds, n_turns)."""
    from lucene_solr_spark.index.builder import BuildConfig, build_index
    from lucene_solr_spark.session import get_spark
    from lucene_solr_spark.sources import gen_transcripts_df

    shutil.rmtree(out_dir, ignore_errors=True)
    spark = get_spark(f"lss-bench-{cores}", cores=cores,
                      shuffle_partitions=max(cores, 8))
    try:
        df = gen_transcripts_df(spark, n_convs=n_convs, seed=42,
                                parallelism=cores * 2)
        t0 = time.time()
        build_index(spark, df, out_dir,
                    BuildConfig(n_buckets=max(cores // 2, 4)))
        dt = time.time() - t0
        import pyarrow.parquet as pq

        n_turns = pq.read_table(
            os.path.join(out_dir, "field_stats")).to_pylist()[0]["max_doc"]
    finally:
        spark.stop()
    return dt, int(n_turns)


def query_bench(index_dir: str, repeats: int = 3) -> dict:
    import numpy as np

    from lucene_solr_spark.oracle import LuceneOracle  # noqa: F401 (import cost outside timing)
    from lucene_solr_spark.query.engine import LocalSearcher
    from lucene_solr_spark.sources.queryset import build_query_set
    import pyarrow.parquet as pq

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
    return {
        "per_query": per_query,
        "p95_sec": float(np.percentile(all_times, 95)),
        "p50_sec": float(np.percentile(all_times, 50)),
        "qps": float(len(all_times) / sum(all_times)),
    }


def main() -> None:
    tag = _sf_tag()
    n_turns_target = _TURNS_BY_SF.get(tag, 200_000)
    n_convs = max(1, round(n_turns_target / 22.5))
    work = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/lss_bench")
    os.makedirs(work, exist_ok=True)

    hi_dir = os.path.join(work, f"idx_{tag}_c{CPUS}")
    hi_sec, n_turns = build_at(CPUS, n_convs, hi_dir)
    hi_tp = n_turns / hi_sec

    scaling = None
    if SCALING and LOW_CORES != CPUS:
        lo_dir = os.path.join(work, f"idx_{tag}_c{LOW_CORES}")
        lo_sec, _ = build_at(LOW_CORES, n_convs, lo_dir)
        lo_tp = n_turns / lo_sec
        eff = (hi_tp / lo_tp) / (CPUS / LOW_CORES)
        scaling = {
            "low_cores": LOW_CORES, "low_turns_per_sec": round(lo_tp, 1),
            "high_cores": CPUS, "high_turns_per_sec": round(hi_tp, 1),
            "efficiency": round(eff, 3),
        }
        shutil.rmtree(lo_dir, ignore_errors=True)

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
        "scaling": scaling,
    }
    _write_baseline_md(out)
    print(json.dumps(out))


def _write_baseline_md(out: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    s = out.get("scaling") or {}
    lines = [
        "# BENCH/BASELINE.md — measured numbers",
        "",
        f"Corpus: {out['n_turns']} synthetic transcript turns "
        f"(deterministic, seed=42), sf tag {out['sf']}.",
        "",
        "| metric | value |",
        "|---|---|",
        f"| index build (local[{CPUS}]) | {out['value']} turns/sec "
        f"({out['build_sec']} s) |",
    ]
    if s:
        lines += [
            f"| index build (local[{s['low_cores']}]) | "
            f"{s['low_turns_per_sec']} turns/sec |",
            f"| **scaling efficiency** {s['low_cores']}->{s['high_cores']} "
            f"cores | **{s['efficiency']}** (target >= 0.8 per north_rule; "
            "sandbox substitute for N vs 4N executors) |",
        ]
    lines += [
        f"| query p50 | {out['query_p50_sec'] * 1000:.2f} ms |",
        f"| query p95 | {out['query_p95_sec'] * 1000:.2f} ms |",
        f"| query throughput | {out['query_qps']} q/s |",
        "",
        "Query set: FIXTURES.md §4 reference set (53 boolean AND/OR "
        "queries, k=10), warm serving path, median of 3 runs per query.",
    ]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    sys.exit(main())
