"""Pins the facts the bench's prepared-plan protocol rests on
(bench.py module docstring / BASELINE.md §E): both engines must
RE-EXECUTE their stored plan on every repetition — if either cached
results, the timed loop would measure a no-op and the suite ratio
would be meaningless."""

from __future__ import annotations


def test_duckdb_relation_reexecutes_per_fetch():
    """A DuckDB relation holds the PLAN, not the result: a fetch after
    an underlying-table mutation must see the new data. (Proved by
    side effect, not timing — timing-based proofs are flaky.)"""
    import duckdb

    con = duckdb.connect()
    con.sql("CREATE TABLE t AS SELECT * FROM range(10) r(i)")
    rel = con.sql("SELECT count(*) AS n, sum(i) AS s FROM t")
    assert rel.fetchall() == [(10, 45)]
    con.sql("INSERT INTO t VALUES (100)")
    # a result-caching relation would still return (10, 45)
    assert rel.fetchall() == [(11, 145)]
    # .df() is the fetch bench.py uses — same re-execution semantics
    d = rel.df()
    assert int(d["n"][0]) == 11 and int(d["s"][0]) == 145


def test_spark_memoized_plan_reexecutes_per_collect(spark, tmp_path):
    """A Spark DataFrame's memoized QueryExecution re-runs its JOBS on
    every collect/toPandas — the memoization skips re-OPTIMIZATION
    (what the bench deliberately excludes) never re-EXECUTION. Proved
    by the scheduler's job counter: each fetch submits new Spark jobs
    in the probe's job group. (Note the memoized plan also pins the
    parquet file-listing snapshot, so every repetition does IDENTICAL
    work over identical data — exactly what a timed repetition wants.)"""
    from pyspark.sql import functions as F

    path = str(tmp_path / "reexec")
    spark.range(10).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path).agg(
        F.count("*").alias("n"), F.sum("id").alias("s")
    )
    sc = spark.sparkContext
    sc.setJobGroup("reexec-probe", "bench methodology probe")
    try:
        first = df.collect()[0]
        assert (first["n"], first["s"]) == (10, 45)
        ids1 = set(sc.statusTracker().getJobIdsForGroup("reexec-probe"))
        assert ids1  # the first fetch ran at least one job
        again = df.toPandas()
        assert int(again["n"][0]) == 10 and int(again["s"][0]) == 45
        ids2 = set(sc.statusTracker().getJobIdsForGroup("reexec-probe"))
        # the second fetch submitted NEW jobs: execution happened again
        assert ids2 > ids1
    finally:
        sc.setJobGroup("", "")
