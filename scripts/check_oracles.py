"""Driver-mimic: run queries() vs oracle_sql() side by side on DuckDB and
compare row-count, schema (column names), and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [only_query_name ...]
"""

import sys
import time

sys.path.insert(0, ".")


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    raise TypeError(type(res))


def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"]:
        try:
            con.sql(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
            )
        except Exception:
            pass

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as e:
            failures.append((name, f"RAY ERROR: {e}"))
            print(f"{name}: RAY ERROR {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only ({len(got)} rows, {dt:.1f}s) OK")
            continue
        try:
            exp = normalize(con.sql(oracles[name]).df())
        except Exception as e:
            failures.append((name, f"SQL ERROR: {e}"))
            print(f"{name}: SQL ERROR {e}")
            continue
        status = []
        if list(got.columns) != list(exp.columns):
            status.append(f"schema {list(got.columns)} != {list(exp.columns)}")
        elif len(got) != len(exp):
            status.append(f"rows {len(got)} != {len(exp)}")
        else:
            for c in got.columns:
                g, x = got[c].values, exp[c].values
                if np.issubdtype(got[c].dtype, np.floating):
                    if not np.allclose(g.astype(float), x.astype(float),
                                       atol=1e-12, rtol=1e-12, equal_nan=True):
                        status.append(f"col {c} values differ")
                elif not (pd.Series(g).astype(str) == pd.Series(x).astype(str)).all():
                    status.append(f"col {c} values differ")
        if status:
            failures.append((name, "; ".join(status)))
            print(f"{name}: MISMATCH {status} ({dt:.1f}s)")
        else:
            print(f"{name}: MATCH ({len(got)} rows, {dt:.1f}s)")

    ray.shutdown()
    print(f"\n{len(failures)} failures")
    for n, s in failures:
        print(" ", n, s)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
