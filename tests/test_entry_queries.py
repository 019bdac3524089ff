"""Mirror of the driver's correctness gate: run every
``__ray_entry__.queries()`` entry at sf0.001 and compare row count +
columns + values against its ``oracle_sql()`` DuckDB result.  Catches
name/type/value drift before the driver's sf0.01 run does."""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))  # repo root

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        tables = [b for b in res.iter_batches(batch_format="pyarrow")]
        if not tables:
            return pd.DataFrame()
        return pa.concat_tables(tables, promote_options="permissive").to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canonical(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append("nan" if math.isnan(v) else round(v, 6))
            else:
                vals.append(v)
        rows.append(tuple(vals))
    return sorted(rows, key=repr)


SQL_CHECKED = sorted(entrymod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entrymod.queries().keys()) - set(SQL_CHECKED))


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(name, con):
    got = to_pandas(entrymod.queries()[name](SF_DIR))
    want = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    cg, cw = canonical(got), canonical(want)
    mism = [i for i, (a, b) in enumerate(zip(cg, cw)) if a != b][:5]
    assert cg == cw, f"{name}: first mismatched rows {[(cg[i], cw[i]) for i in mism]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    got = to_pandas(entrymod.queries()[name](SF_DIR))
    assert len(got) > 0
    assert len(got.columns) > 0


def test_entry_smoke():
    got = to_pandas(entrymod.entry())
    assert len(got) > 0
    assert {"name", "score"} <= set(got.columns)
