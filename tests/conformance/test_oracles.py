"""Operator conformance vs DuckDB (SURVEY.md §5 layer 2) — mirrors the
driver's check: for every SQL-oracled queries() entry, row-count + schema
(column names) + order-insensitive value match at sf0.001/sf0.01."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import __ray_entry__ as entrymod

# Default covers BOTH the fast scale and the DRIVER'S scale (sf0.01): the
# round-3 graph_triangles crash was block-layout dependent and only appeared
# at sf0.01 — conformance must exercise the driver's contract by default.
# CONFORMANCE_SF_DIR still overrides to a single (e.g. bigger) scale.
# Wall-time cost of the second scale: ~2x (sf0.01 queries run 1-3 s each).
_env_sf = os.environ.get("CONFORMANCE_SF_DIR")
SF_DIRS = [_env_sf] if _env_sf else [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
]

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _duck(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).fetchdf()


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


SQL_ORACLED = sorted(entrymod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entrymod.queries().keys()) - set(SQL_ORACLED))


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[d.rsplit("/", 1)[-1] for d in SF_DIRS])
@pytest.mark.parametrize("name", SQL_ORACLED)
def test_oracle_match(ray_session, name, sf_dir):
    q = entrymod.queries()[name]
    ray_df = _normalize(_to_pandas(q(sf_dir)))
    duck_df = _normalize(_duck(entrymod.oracle_sql()[name], sf_dir))
    assert list(ray_df.columns) == list(duck_df.columns), (
        f"{name}: columns {list(ray_df.columns)} != {list(duck_df.columns)}"
    )
    assert len(ray_df) == len(duck_df), f"{name}: {len(ray_df)} != {len(duck_df)} rows"
    # EXACT comparison — the driver hashes raw values, so any float that is
    # not bit-identical on both sides fails there; a tolerance here would
    # hide it (the round-1 lesson: local "green" with 1e-9 tolerance shipped
    # 4 driver hash failures).
    for c in ray_df.columns:
        a, b = ray_df[c], duck_df[c]
        if pd.api.types.is_float_dtype(a):
            import numpy as np

            av, bv = a.to_numpy(dtype="float64"), b.to_numpy(dtype="float64")
            same = (av == bv) | (np.isnan(av) & np.isnan(bv))
            assert same.all(), (
                f"{name}.{c}: float not bit-exact; max abs diff "
                f"{np.nanmax(np.abs(av - bv))}"
            )
        else:
            pd.testing.assert_series_equal(
                a, b, check_dtype=False, check_names=False, obj=f"{name}.{c}"
            )


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[d.rsplit("/", 1)[-1] for d in SF_DIRS])
@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(ray_session, name, sf_dir):
    q = entrymod.queries()[name]
    res = q(sf_dir)
    df = _to_pandas(res)
    # NON-EMPTY is the repo invariant (CLAUDE.md): an empty Dataset loses
    # its schema through to_pandas and the driver records a mismatch.
    assert df.shape[0] >= 1
    assert df.shape[1] >= 1
