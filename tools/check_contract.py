"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, compare row count, column names, and
order-insensitive values (columns sorted by name, rows sorted by all
columns). Usage: python tools/check_contract.py [sf_dir] [name ...]"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name, spark_pdf, duck_pdf) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            if np.issubdtype(a[c].dtype, np.floating):
                ok = np.allclose(
                    a[c].to_numpy(float), b[c].to_numpy(float),
                    rtol=1e-6, atol=1e-6, equal_nan=True,
                )
            else:
                ok = (a[c].astype(str).to_numpy() == b[c].astype(str).to_numpy()).all()
            if not ok:
                bad = (a[c].astype(str) != b[c].astype(str)).to_numpy().nonzero()[0][:3]
                problems.append(
                    f"values differ in {c!r}: e.g. rows {bad.tolist()} "
                    f"spark={a[c].iloc[bad].tolist()} duck={b[c].iloc[bad].tolist()}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from search_engine_spark.session import get_spark

    spark = get_spark("contract-check", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = set(oracles) - set(qs)
    if missing:
        print("ORACLE WITHOUT QUERY:", missing)

    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows ({t_spark:.1f}s)")
            continue
        t0 = time.time()
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        t_duck = time.time() - t0
        problems = compare(name, sdf, ddf)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({len(sdf)} vs {len(ddf)} rows):")
            for p in problems:
                print("   ", p)
        else:
            print(f"OK   {name}: {len(sdf)} rows (spark {t_spark:.1f}s, duck {t_duck:.1f}s)")
    print("entry():", end=" ")
    try:
        edf = entrymod.entry(spark)
        rows = edf.collect()
        print(f"OK {len(rows)} rows, schema {[f.name for f in edf.schema.fields]}")
    except Exception as e:
        print(f"FAIL {type(e).__name__}: {str(e)[:300]}")
        n_fail += 1
    print("FAILURES:", n_fail)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
