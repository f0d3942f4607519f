"""Local mimic of the driver's correctness gate.

Runs each __ray_entry__.queries() callable at --sf-dir, runs the
matching oracle_sql() in DuckDB over the same parquet (views
pre-registered), and compares row count, sorted schema names, and an
order-insensitive value hash (columns sorted by name, rows sorted).

Usage: python scripts/check_oracle.py [--sf-dir /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(obj, ray.data.Dataset):
            obj = obj.to_pandas()
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        obj = obj.to_pandas()
    return obj


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    # canonicalize dtypes: ints -> int64, floats -> float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        else:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return hashlib.md5(pd.util.hash_pandas_object(df, index=False).values.tobytes()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    import __ray_entry__ as E

    qs = E.queries()
    oracles = E.oracle_sql()
    names = args.names or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')")

    n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            mine = to_pandas(qs[name](args.sf_dir))
        except Exception as e:
            print(f"FAIL {name}: engine raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(mine)} rows ({dt:.1f}s)")
            continue
        try:
            oracle = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if len(mine) != len(oracle):
            problems.append(f"rows {len(mine)} vs {len(oracle)}")
        if sorted(mine.columns) != sorted(oracle.columns):
            problems.append(f"schema {sorted(mine.columns)} vs {sorted(oracle.columns)}")
        elif value_hash(mine) != value_hash(oracle):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({dt:.1f}s)")
            n_fail += 1
            # show a diff sample
            if sorted(mine.columns) == sorted(oracle.columns) and len(mine) and len(oracle):
                a = mine[sorted(mine.columns)].sort_values(by=sorted(mine.columns)).reset_index(drop=True)
                b = oracle[sorted(oracle.columns)].sort_values(by=sorted(oracle.columns)).reset_index(drop=True)
                n = min(len(a), len(b))
                neq = (a.iloc[:n].astype(str).values != b.iloc[:n].astype(str).values).any(axis=1)
                idx = np.nonzero(neq)[0][:3]
                for i in idx:
                    print(f"   mine:   {a.iloc[i].to_dict()}")
                    print(f"   oracle: {b.iloc[i].to_dict()}")
        else:
            print(f"PASS {name}: {len(mine)} rows ({dt:.1f}s)")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
