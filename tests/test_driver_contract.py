"""Replicates the driver's correctness gate locally: run each queries()
entry and its oracle_sql() through DuckDB on the same tables, compare
row-count + column names + order-insensitive values (sf0.001 for speed;
the driver uses sf0.01)."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

# the driver's correctness scale — transcript oracle SQL embeds the
# sf0.01 adversarial-corpus path, so the queries must run at the same sf
SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(res):
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def catalog():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _oracle_names():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    return sorted(e.oracle_sql())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(name, catalog, con):
    queries, oracles = catalog
    got = _normalize(_to_pandas(queries[name](SF)))
    exp = _normalize(con.sql(oracles[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-6)


def test_rows_only_queries_run(catalog):
    queries, oracles = catalog
    for name in sorted(set(queries) - set(oracles)):
        df = _to_pandas(queries[name](SF))
        assert len(df) >= 0 and df.shape[1] >= 2, name


def test_entry_smoke():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    df = e.entry()
    assert len(df) > 0
    assert {"sink", "n_rows", "max_counter"} <= set(df.columns)
