"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at the given sf dir, compare
row count, column names, and order-insensitive values."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def compare(sf_dir: str, only: list[str] | None = None) -> int:
    import __spark_entry__ as E
    from lucene_solr_spark.session import get_spark

    spark = get_spark("gate-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = E.queries()
    sqls = E.oracle_sql()
    if only:
        qs = {n: f for n, f in qs.items() if n in only}
    failures = 0
    for name, fn in qs.items():
        try:
            got = fn(spark, sf_dir).toPandas()
            if name not in sqls:
                print(f"  {name}: rows={len(got)} (no oracle, rows-only)")
                continue
            want = con.execute(sqls[name]).df()
            ok_cols = sorted(got.columns) == sorted(want.columns)
            g = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
            w = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
            ok_rows = len(g) == len(w)
            ok_vals = False
            if ok_rows and ok_cols:
                try:
                    pd.testing.assert_frame_equal(
                        g, w, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9
                    )
                    ok_vals = True
                except AssertionError as e:
                    ok_vals = False
                    err = str(e).splitlines()[:6]
            status = "OK" if (ok_cols and ok_rows and ok_vals) else "FAIL"
            if status == "FAIL":
                failures += 1
                print(f"  {name}: {status} cols={ok_cols} rows={len(g)}/{len(w)}")
                if ok_rows and ok_cols:
                    print("    " + "\n    ".join(err))
                    print("    spark:", g.head(3).to_dict("records"))
                    print("    duck :", w.head(3).to_dict("records"))
                else:
                    print("    spark cols:", list(got.columns), "duck cols:", list(want.columns))
            else:
                print(f"  {name}: OK ({len(g)} rows)")
        except Exception as ex:  # noqa: BLE001
            failures += 1
            print(f"  {name}: ERROR {type(ex).__name__}: {ex}")
    # entry smoke
    if not only:
        try:
            n = E.entry(spark).count()
            print(f"  entry(): {n} rows")
        except Exception as ex:  # noqa: BLE001
            failures += 1
            print(f"  entry(): ERROR {ex}")
    spark.stop()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rc = compare(sf, only=sys.argv[2:] or None)
    print("FAILURES:", rc)
    sys.exit(1 if rc else 0)
