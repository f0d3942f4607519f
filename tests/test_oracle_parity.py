"""Driver-gate parity inside pytest: Ray pipelines vs DuckDB oracles.

Runs a representative subset of __ray_entry__.queries() at sf0.001 and
compares row count + schema + order-insensitive values against
oracle_sql() — the same comparison the external driver performs at
sf0.01 (scripts/check_oracle.py is the full-set version).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

SUBSET = [
    "tile_plan",
    "pip_count",
    "clip_join",
    "knn_join",
    "cell_hist",
    "f1_rollup",
    "lineitem_agg",
    "tpch_q5",
    "token_count",
    "dedup_exact",
    "jaccard_adjacent",
    "ann_topk",
    "affine_transform",
    "quantiles",
    "match_join",
    "group_topk",
    "hash_split",
    "pack_sequences",
]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(entry_mod, oracle_con, name):
    import pyarrow as pa

    import ray.data

    res = entry_mod.queries()[name](SF_DIR)
    if isinstance(res, ray.data.Dataset):
        mine = res.to_pandas()
    elif isinstance(res, pa.Table):
        mine = res.to_pandas()
    else:
        mine = res
    oracle = oracle_con.execute(entry_mod.oracle_sql()[name]).df()
    assert len(mine) == len(oracle), f"row count {len(mine)} vs {len(oracle)}"
    assert sorted(mine.columns) == sorted(oracle.columns)
    a, b = _canon(mine), _canon(oracle)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
