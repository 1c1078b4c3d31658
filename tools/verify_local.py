"""Local stand-in for the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same sf dir, compares row count, column-name set, and an order-insensitive
value hash (columns sorted by name, rows sorted by stringified values).
"""

from __future__ import annotations

import hashlib
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

from bigdata_cookbook_spark.session import get_spark
from bigdata_cookbook_spark.sources.testdata import TABLES

import __spark_entry__ as entrymod

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None


def _sval(v) -> str:
    import datetime

    if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
        return "NULL"
    if isinstance(v, pd.Timestamp) or isinstance(v, datetime.datetime):
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
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(df), cols, h


def main() -> int:
    import os

    # SPARK_GRAFT_SHUFFLE_PARTITIONS: rerun the whole gate under a
    # different shuffle width (e.g. 7, 64) — results must be identical,
    # or a query depends on physical partitioning (hidden order
    # sensitivity in collect_list/first/ffill etc.)
    sp = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    spark = get_spark("verify_local", shuffle_partitions=int(sp) if sp else None)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows={len(sdf)} (no oracle)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        sn, sc, sh = canon(sdf)
        on, oc, oh = canon(odf)
        ok = (sn == on) and (sc == oc) and (sh == oh)
        status = "OK  " if ok else "FAIL"
        if not ok:
            failures += 1
            print(f"{status} {name}: spark(rows={sn},cols={sc},h={sh[:8]}) duckdb(rows={on},cols={oc},h={oh[:8]})")
            if sn == on and sc == oc:
                # show a sample diff
                merged = sdf.sort_values(sorted(sdf.columns)).head(5)
                print("  spark head:\n", merged.to_string())
                print("  duckdb head:\n", odf.sort_values(sorted(odf.columns)).head(5).to_string())
        else:
            print(f"{status} {name}: rows={sn}")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
