"""Local emulation of the driver's correctness gate: run each
``queries()`` entry and its ``oracle_sql()`` twin on sf0.01, compare
row count, column names, and order-insensitive values."""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    import __spark_entry__ as E
    from tdigest_spark.spark.session import get_spark

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    if ONLY:
        unknown = [n for n in ONLY if n not in qs]
        if unknown:
            # a typo'd filter must not produce a green 0/0 run
            print(f"ERROR: unknown query name(s): {unknown}")
            return 2
    failures = []
    ran = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        ran += 1
        t0 = time.time()
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark query raised: {exc}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(got)} rows ({dt:.1f}s)")
            continue
        want = con.execute(oracles[name]).df()
        status = []
        if len(got) != len(want):
            status.append(f"rowcount {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            status.append(f"columns {sorted(got.columns)} != {sorted(want.columns)}")
        if not status:
            g, w = norm(got), norm(want)
            try:
                pd.testing.assert_frame_equal(
                    g, w, check_dtype=False, check_exact=False, rtol=1e-9
                )
            except AssertionError as exc:
                status.append(f"values differ: {str(exc)[:400]}")
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)} ({dt:.1f}s)")
            print("  spark:", got.head(3).to_dict("records"))
            print("  oracle:", want.head(3).to_dict("records"))
        else:
            print(f"PASS {name}: {len(got)} rows ({dt:.1f}s)")
    # count only queries that actually RAN — with a subset filter,
    # skipped queries must not be reported as passing
    print(f"\n{ran - len(failures)}/{ran} queries pass"
          + (f" ({len(qs) - ran} skipped by filter)" if ran < len(qs) else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
