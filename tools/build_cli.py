"""spark-submit entrypoint for the index build / append / compact /
validate lifecycle (the north-star deployment path).

Cluster usage (ship the package with --py-files):

    zip -r lss.zip lucene_solr_spark/
    spark-submit --py-files lss.zip tools/build_cli.py \\
        build --input s3://bucket/transcripts/ --index s3://bucket/idx \\
        --buckets 256 --positions

    spark-submit --py-files lss.zip tools/build_cli.py \\
        append --input s3://bucket/new_batch/ --index s3://bucket/idx
    spark-submit --py-files lss.zip tools/build_cli.py \\
        compact --index s3://bucket/idx --out s3://bucket/idx_c
    spark-submit --py-files lss.zip tools/build_cli.py \\
        validate --input s3://bucket/transcripts/ --index s3://bucket/idx
    spark-submit --py-files lss.zip tools/build_cli.py \\
        search --index /path/idx --query "retry AND deploy" -k 10
    python tools/build_cli.py search --index /path/idx \\
        --query 'batch #role:user #ts:[2026-01-01 TO *]' --after 123:0.817
    python tools/build_cli.py delete --index /path/idx --doc-ids 5,9,120

Local smoke (no cluster): python tools/build_cli.py build --input ... \\
    --index ... --local 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark(args):
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName(f"lss-{args.cmd}")
    if args.local:
        from lucene_solr_spark.session import get_spark

        return get_spark(f"lss-{args.cmd}", cores=args.local)
    # under spark-submit the master/executors come from the submit conf
    return (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="lss")
    ap.add_argument("cmd", choices=["build", "append", "compact",
                                    "validate", "search", "delete",
                                    "explain"])
    ap.add_argument("--input", help="transcripts table path (parquet)")
    ap.add_argument("--index", required=True, help="index directory")
    ap.add_argument("--out", help="output index dir (compact)")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--positions", action="store_true")
    ap.add_argument("--k1", type=float, default=1.2)
    ap.add_argument("--b", type=float, default=0.75)
    ap.add_argument("--salt-df-threshold", type=int, default=200_000)
    ap.add_argument("--query", help="query string (search)")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--after", help="searchAfter cursor doc_id:score")
    ap.add_argument("--doc-ids", help="comma-separated docIDs (delete)")
    ap.add_argument("--doc", type=int, help="docID to explain")
    ap.add_argument("--local", type=int, default=0,
                    help="run on local[N] instead of the submit master")
    args = ap.parse_args(argv)

    if args.cmd == "search":
        from lucene_solr_spark.query.engine import LocalSearcher

        after = None
        if args.after:
            d, s_ = args.after.split(":", 1)
            after = (int(d), float(s_))
        hits = LocalSearcher(args.index).search(args.query, args.k,
                                                after=after)
        print(json.dumps([{"doc_id": d, "score": s} for d, s in hits]))
        return 0
    if args.cmd == "explain":
        from lucene_solr_spark.query.engine import LocalSearcher

        print(json.dumps(
            LocalSearcher(args.index).explain(args.query, args.doc), indent=1
        ))
        return 0
    if args.cmd == "delete":
        from lucene_solr_spark.index.deletes import delete_docs, read_deleted

        delete_docs(args.index, [int(x) for x in args.doc_ids.split(",")])
        print(json.dumps({"deleted_total": int(read_deleted(args.index).size)}))
        return 0

    from lucene_solr_spark.index.builder import (
        BuildConfig, append_segment, build_index, compact_index,
        validate_index,
    )

    cfg = BuildConfig(
        n_buckets=args.buckets, partitions=args.partitions,
        positions=args.positions, k1=args.k1, b=args.b,
        salt_df_threshold=args.salt_df_threshold,
    )
    spark = _spark(args)
    try:
        if args.cmd == "build":
            m = build_index(spark, spark.read.parquet(args.input),
                            args.index, cfg)
            print(json.dumps({"committed": sorted(m["committed"])}))
        elif args.cmd == "append":
            m = append_segment(spark, spark.read.parquet(args.input),
                               args.index)
            print(json.dumps({"next_seg": m.get("next_seg")}))
        elif args.cmd == "compact":
            m = compact_index(spark, args.index, args.out or args.index + "_c")
            print(json.dumps({"committed": sorted(m["committed"])}))
        elif args.cmd == "validate":
            rep = validate_index(spark, spark.read.parquet(args.input),
                                 args.index)
            print(json.dumps(rep))
            return 0 if rep["ok"] else 2
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
