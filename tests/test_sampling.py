"""Deterministic hash sampling/splits: stability, portability, accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_cookbook_spark.operators.sampling import (
    N_BUCKETS,
    hash_sample,
    hash_split,
    stratified_hash_sample,
)
from bigdata_cookbook_spark.sources.testdata import load_table

# tools/ lives next to the package, derived from this file so the suite
# runs from any checkout location (ADVICE round 10)
from pathlib import Path

PLAN_REPORT_PY = str(Path(__file__).resolve().parents[1] / "tools" / "plan_report.py")



@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id")


def test_split_is_exhaustive_and_disjoint(docs):
    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.count() == docs.count()
    assert out.filter(F.col("split").isNull()).count() == 0
    per = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(per) <= {"train", "val", "test"}


def test_split_fractions_approximate(docs):
    n = docs.count()
    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    train = out.filter(F.col("split") == "train").count()
    # md5 buckets are uniform; 500 ids at p=.8 -> sd ~ sqrt(.8*.2*500) ~ 9
    assert abs(train / n - 0.8) < 0.08


def test_assignment_stable_under_growth(docs):
    """Adding rows must never reassign existing ones."""
    frac = {"train": 0.8, "val": 0.1, "test": 0.1}
    subset = docs.filter(F.col("doc_id") % 3 == 0)
    full_map = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, "doc_id", frac).collect()
    }
    sub_map = {
        r["doc_id"]: r["split"]
        for r in hash_split(subset, "doc_id", frac).collect()
    }
    assert all(full_map[k] == v for k, v in sub_map.items())


def test_sample_is_subset_semantics(docs):
    """hash_sample(f) rows = the first f-fraction of bucket space, so a
    larger fraction strictly contains a smaller one (nested samples)."""
    small = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1).collect()}
    large = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).collect()}
    assert small <= large
    assert len(small) < len(large)


def test_salt_gives_independent_sample(docs):
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.5, salt="a").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.5, salt="b").collect()}
    assert a != b
    overlap = len(a & b) / max(1, len(a))
    assert 0.2 < overlap < 0.8  # ~50% expected for independent halves


def test_bad_fractions_rejected(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.3})


def test_stratified_matches_plain_sample_per_stratum(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    out = stratified_hash_sample(
        orders, "o_orderkey", "o_orderpriority",
        {"1-URGENT": 0.2}, default_fraction=0.05,
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    expect_urgent = {
        r["o_orderkey"] for r in hash_sample(urgent, "o_orderkey", 0.2).collect()
    }
    got_urgent = {
        r["o_orderkey"]
        for r in out.filter(F.col("o_orderpriority") == "1-URGENT").collect()
    }
    assert got_urgent == expect_urgent


def test_weighted_sample_biases_toward_heavy_rows(spark, sf_dir):
    from bigdata_cookbook_spark.operators.sampling import weighted_hash_sample

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    out = weighted_hash_sample(orders, "o_orderkey", "o_totalprice", 0.1)
    n, n_all = out.count(), orders.count()
    assert abs(n / n_all - 0.1) < 0.03  # expected size ~ fraction * n
    # importance property: sampled rows are value-heavier on average
    m_s = out.agg(F.avg("o_totalprice")).first()[0]
    m_a = orders.agg(F.avg("o_totalprice")).first()[0]
    assert m_s > m_a * 1.1
    # deterministic
    assert out.count() == weighted_hash_sample(
        orders, "o_orderkey", "o_totalprice", 0.1
    ).count()


def test_deterministic_shuffle_realizes_global_order(spark, sf_dir):
    """The range-partitioned operator must enumerate rows (partition 0
    first, in-partition order) in EXACTLY the permutation the md5 rank
    defines — no single-reducer sort, same total order."""
    from bigdata_cookbook_spark.operators.sampling import deterministic_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = deterministic_shuffle(docs, "doc_id", seed=42, n_output_partitions=5)
    assert out.rdd.getNumPartitions() == 5
    # enumerate in partition-index order without disturbing row order
    streamed = [r.doc_id for r in out.toLocalIterator()]
    want = [
        r.doc_id
        for r in docs.select("doc_id")
        .withColumn(
            "k",
            F.md5(F.encode(F.concat(F.col("doc_id").cast("string"), F.lit(":42")), "UTF-8")),
        )
        .orderBy("k", "doc_id")
        .collect()
    ]
    assert streamed == want
    # a different seed is a different permutation of the same rows
    other = [
        r.doc_id
        for r in deterministic_shuffle(docs, "doc_id", seed=7, n_output_partitions=5).toLocalIterator()
    ]
    assert sorted(other) == sorted(want) and other != want


def test_domain_mix_exact_quotas_and_stability(spark, sf_dir):
    from bigdata_cookbook_spark.operators.sampling import domain_mix_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    shares = {f"src{i}": (2.0 if i < 5 else 1.0) for i in range(20)}
    out = domain_mix_sample(docs, "source", "doc_id", shares)
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    counts = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_out = min(counts[d] / (s / 25.0) for d, s in shares.items())
    for d, s in shares.items():
        assert per.get(d, 0) == int((s / 25.0) * n_out), d
    # heavy domains carry double the light ones (up to the floor remainder)
    assert per["src0"] in (2 * per["src19"], 2 * per["src19"] + 1)
    # deterministic: a rerun picks the identical row set
    again = domain_mix_sample(docs, "source", "doc_id", shares)
    assert sorted(r.doc_id for r in out.collect()) == sorted(r.doc_id for r in again.collect())
    # unknown domain -> loud error
    with pytest.raises(ValueError):
        domain_mix_sample(docs, "source", "doc_id", {"nope": 1.0})


def test_global_rank_matches_partitionless_row_number(spark, sf_dir):
    """global_rank == row_number().over(Window.orderBy(...)) bit-for-bit,
    asc and desc, while the plan keeps the fact table out of any
    single-partition exchange (the scale point of the operator)."""
    from pyspark.sql import Window as W

    from bigdata_cookbook_spark.operators.sampling import global_rank

    docs = load_table(spark, sf_dir, "documents")
    cases = [
        (["doc_id"], W.orderBy("doc_id")),
        (
            [F.length("text").desc(), F.col("doc_id")],
            W.orderBy(F.length("text").desc(), F.col("doc_id")),
        ),
    ]
    for cols, win in cases:
        got = {r.doc_id: r.rk for r in global_rank(docs, cols, rank_col="rk").collect()}
        want = {
            r.doc_id: r.rk
            for r in docs.withColumn("rk", F.row_number().over(win)).collect()
        }
        assert got == want

    # ranks invariant under the range-partition width (boundaries move,
    # total order does not)
    for n in (3, 7, 64):
        got_n = {
            r.doc_id: r.rk
            for r in global_rank(docs, ["doc_id"], rank_col="rk", n_partitions=n).collect()
        }
        assert got_n == {r.doc_id: r.rk for r in global_rank(docs, ["doc_id"], rank_col="rk").collect()}

    # total_col carries the exact global count on every row
    tot = global_rank(docs, ["doc_id"], total_col="N").select("N").distinct().collect()
    assert [r.N for r in tot] == [docs.count()]


def test_global_rank_plan_has_no_single_partition_fact_exchange(spark, sf_dir):
    """The executed plan's only SinglePartition exchanges sit above the
    tiny per-partition-count aggregate, never on the fact path — exactly
    what the plan_report GlobalWindowOverScan gate checks for."""
    import importlib.util

    from bigdata_cookbook_spark.operators.sampling import global_rank

    spec = importlib.util.spec_from_file_location("prmod", PLAN_REPORT_PY)
    pr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pr)

    docs = load_table(spark, sf_dir, "documents")
    df = global_rank(docs, ["doc_id"], rank_col="rk")
    for _ in df.toLocalIterator():
        pass
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert pr.global_windows_over_scans(executed) == []


def test_plan_gate_flags_planted_global_window_over_scan(spark, sf_dir):
    """The done-criterion for the round-4 gate: a partitionless ordered
    window straight over a fact scan IS flagged; the legitimate shapes
    (partitioned, partition-no-order, post-aggregate, post-limit) are
    NOT."""
    import importlib.util

    from pyspark.sql import Window as W

    spec = importlib.util.spec_from_file_location("prmod", PLAN_REPORT_PY)
    pr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pr)

    docs = load_table(spark, sf_dir, "documents")

    def executed_plan(df):
        for _ in df.toLocalIterator():
            pass
        return df._jdf.queryExecution().executedPlan().toString()

    planted = docs.withColumn("rn", F.row_number().over(W.orderBy("doc_id")))
    assert pr.global_windows_over_scans(executed_plan(planted)), "planted fact-table global window must be flagged"

    partitioned = docs.withColumn(
        "rn", F.row_number().over(W.partitionBy("source").orderBy("doc_id"))
    )
    assert pr.global_windows_over_scans(executed_plan(partitioned)) == []

    part_no_order = docs.withColumn(
        "n", F.count(F.lit(1)).over(W.partitionBy("source"))
    )
    assert pr.global_windows_over_scans(executed_plan(part_no_order)) == []

    post_agg = (
        docs.groupBy("source")
        .count()
        .withColumn("rn", F.row_number().over(W.orderBy("source")))
    )
    assert pr.global_windows_over_scans(executed_plan(post_agg)) == []

    post_limit = (
        docs.orderBy("doc_id")
        .limit(5)
        .withColumn("rn", F.row_number().over(W.orderBy("doc_id")))
    )
    assert pr.global_windows_over_scans(executed_plan(post_limit)) == []


class TestClusterSafeSplit:
    """Leakage-safe split: near-dup clusters land in ONE split."""

    @pytest.fixture(scope="class")
    def split_out(self, spark, docs):
        from bigdata_cookbook_spark.operators.sampling import cluster_safe_split

        # synthetic candidate pairs: a chain 0-1-2 (one transitive
        # cluster spanning ids that hash to different splits on their
        # own) plus a detached pair, over the real docs table
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (10, 11)], "doc_a long, doc_b long"
        )
        frac = {"train": 0.8, "val": 0.1, "test": 0.1}
        return (
            cluster_safe_split(docs, pairs, "doc_id", frac),
            pairs,
            frac,
        )

    def test_no_pair_straddles_splits(self, split_out):
        out, pairs, _ = split_out
        a = out.select(
            F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")
        )
        b = out.select(
            F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")
        )
        straddlers = (
            pairs.join(a, "doc_a").join(b, "doc_b")
            .filter(F.col("sa") != F.col("sb"))
            .count()
        )
        assert straddlers == 0
        # transitivity too: 0 and 2 share no direct edge but one cluster
        rows = {r["doc_id"]: r for r in out.filter(F.col("doc_id") < 3).collect()}
        assert rows[0]["split"] == rows[1]["split"] == rows[2]["split"]
        assert rows[0]["canonical_id"] == rows[2]["canonical_id"] == 0

    def test_singletons_split_exactly_like_hash_split(self, split_out, docs):
        out, _, frac = split_out
        clustered = {0, 1, 2, 10, 11}
        plain = {
            r["doc_id"]: r["split"]
            for r in hash_split(docs, "doc_id", frac).collect()
        }
        for r in out.collect():
            if r["doc_id"] not in clustered:
                assert r["split"] == plain[r["doc_id"]], r["doc_id"]
                assert r["canonical_id"] == r["doc_id"]

    def test_covers_every_document_once(self, split_out, docs):
        out, _, _ = split_out
        assert out.count() == docs.count()
        assert out.select("doc_id").distinct().count() == docs.count()


class TestPackShards:
    @pytest.fixture(scope="class")
    def sized(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return docs.select("doc_id", F.octet_length("text").alias("n_bytes"))

    def test_shards_are_contiguous_and_filled(self, sized):
        from bigdata_cookbook_spark.operators.sampling import pack_shards

        S = 4096
        rows = sorted(
            pack_shards(sized, ["doc_id"], "n_bytes", S).collect(),
            key=lambda r: r["doc_id"],
        )
        # shard ids non-decreasing in the pack order; exact prefix rule
        cum = 0
        max_shard = 0
        for r in rows:
            assert r["shard_id"] == cum // S, r
            cum += r["n_bytes"]
            max_shard = max(max_shard, r["shard_id"])
        # every shard id in [0, max] occupied (contiguous numbering)
        assert {r["shard_id"] for r in rows} == set(range(max_shard + 1))

    def test_partition_count_invariance(self, sized):
        from bigdata_cookbook_spark.operators.sampling import pack_shards

        a = {
            r["doc_id"]: r["shard_id"]
            for r in pack_shards(sized, ["doc_id"], "n_bytes", 4096, n_partitions=3).collect()
        }
        b = {
            r["doc_id"]: r["shard_id"]
            for r in pack_shards(sized, ["doc_id"], "n_bytes", 4096, n_partitions=17).collect()
        }
        assert a == b

    def test_oversized_row_gets_own_shard(self, spark):
        from bigdata_cookbook_spark.operators.sampling import pack_shards

        df = spark.createDataFrame(
            [(1, 10), (2, 500), (3, 10), (4, 10)], "id long, b long"
        )
        got = {
            r["id"]: r["shard_id"]
            for r in pack_shards(df, ["id"], "b", 100).collect()
        }
        # row 2 starts in shard 0 (offset 10) and spills past several
        # boundaries; row 3 starts at offset 510 -> shard 5 — the
        # oversized doc effectively owns shards 0-4
        assert got == {1: 0, 2: 0, 3: 5, 4: 5}

    def test_rejects_nonpositive_shard_bytes(self, sized):
        from bigdata_cookbook_spark.operators.sampling import pack_shards

        with pytest.raises(ValueError):
            pack_shards(sized, ["doc_id"], "n_bytes", 0)


class TestDomainMixTemperature:
    def test_alpha_one_keeps_natural_proportions(self, spark, sf_dir):
        from bigdata_cookbook_spark.operators.sampling import domain_mix_temperature

        docs = load_table(spark, sf_dir, "documents")
        out = domain_mix_temperature(docs, "source", "doc_id", alpha=1.0)
        # quota_d = floor(n_d * min_e(n_e^0)) = n_d: everything kept
        assert out.count() == docs.count()

    def test_alpha_zero_forces_uniform(self, spark, sf_dir):
        from bigdata_cookbook_spark.operators.sampling import domain_mix_temperature

        docs = load_table(spark, sf_dir, "documents")
        out = domain_mix_temperature(docs, "source", "doc_id", alpha=0.0)
        per = [r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()]
        min_n = min(
            r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
        )
        assert per and all(n == min_n for n in per)

    def test_half_alpha_upweights_small_domains(self, spark):
        from bigdata_cookbook_spark.operators.sampling import domain_mix_temperature

        # 400 "big" rows vs 100 "small": natural share 80/20; sqrt
        # share 2:1 (66.7/33.3) — the small domain's share must rise
        rows = [(i, "big" if i < 400 else "small") for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = domain_mix_temperature(df, "source", "doc_id", alpha=0.5)
        per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        total = sum(per.values())
        assert per["small"] / total > 0.25  # natural was 0.20
        # deterministic: same call twice -> same rows
        ids1 = {r["doc_id"] for r in out.collect()}
        ids2 = {
            r["doc_id"]
            for r in domain_mix_temperature(df, "source", "doc_id", alpha=0.5).collect()
        }
        assert ids1 == ids2

    def test_alpha_out_of_range_rejected(self, spark, sf_dir):
        from bigdata_cookbook_spark.operators.sampling import domain_mix_temperature

        docs = load_table(spark, sf_dir, "documents")
        with pytest.raises(ValueError):
            domain_mix_temperature(docs, "source", "doc_id", alpha=1.5)


class TestDomainMixScaleTiers:
    """Round-9 hardening: the collected-quota tier is guarded against
    registered-domain-cardinality keys; the relational tier computes
    the identical mix with no collect anywhere."""

    def test_cardinality_guard_trips(self, spark):
        from bigdata_cookbook_spark.operators.sampling import (
            domain_mix_temperature,
        )

        df = spark.range(200).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("domain-"), F.col("id")).alias("source"),
        )
        with pytest.raises(ValueError, match="relational=True"):
            domain_mix_temperature(
                df, "source", "doc_id", alpha=0.5, max_domains=100
            )

    def test_relational_tier_matches_collected_tier(self, spark, sf_dir):
        from bigdata_cookbook_spark.operators.sampling import (
            domain_mix_temperature,
        )

        docs = load_table(spark, sf_dir, "documents")
        collected = domain_mix_temperature(
            docs, "source", "doc_id", alpha=0.5
        )
        rel = domain_mix_temperature(
            docs, "source", "doc_id", alpha=0.5, relational=True
        )
        a = {r.doc_id for r in collected.select("doc_id").collect()}
        b = {r.doc_id for r in rel.select("doc_id").collect()}
        assert a == b and a
        # the tiers are positionally interchangeable: same column order
        # (round-10 self-review pin — the relational rewrite must keep
        # the collected tier's domain-first layout)
        assert collected.columns == rel.columns

    def test_relational_tier_handles_high_cardinality(self, spark):
        from bigdata_cookbook_spark.operators.sampling import (
            domain_mix_temperature,
        )

        # 500 domains of size 4 + one mega-domain of 2000 rows: over the
        # (tightened) guard, fine relationally; alpha=0.5 quotas =
        # floor(sqrt(n_d) * min sqrt(n_e)) = floor(2 * sqrt(n_d))
        df = spark.range(4000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 2000, F.lit("mega"))
            .otherwise(F.concat(F.lit("d"), (F.col("id") % 500)))
            .alias("source"),
        )
        out = domain_mix_temperature(
            df, "source", "doc_id", alpha=0.5, max_domains=100,
            relational=True,
        )
        per = {
            r.source: r.n
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        import math

        assert per["mega"] == math.floor(2 * math.sqrt(2000))
        assert all(v == 4 for k, v in per.items() if k != "mega")

    def test_relational_tier_has_no_rank_window_over_fact_rows(self, spark):
        """Round-10 VERDICT item 2: the relational tier exists FOR the
        skewed registered-domain key, so its plan must never rank a
        domain's rows through one task. The rank is the global_rank
        offsets composition — assert the plan carries NO row_number
        window at all, and that the only window left (the offsets
        running sum) partitions over the (pid, domain) AGGREGATE:
        every windowspecdefinition must reference __pid, whose
        per-domain group size is bounded by the partition count."""
        from bigdata_cookbook_spark.operators.sampling import (
            domain_mix_temperature,
        )

        df = spark.range(2000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("d"), (F.col("id") % 50)).alias("source"),
        )
        out = domain_mix_temperature(
            df, "source", "doc_id", alpha=0.5, relational=True
        )
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "row_number" not in plan.lower()
        specs = [
            ln for ln in plan.splitlines() if "windowspecdefinition" in ln
        ]
        assert specs, "expected the offsets running-sum window"
        assert all("__pid" in ln for ln in specs)
        # and the plan_report gate itself: no partitionless ordered
        # window over a scan (the only SinglePartition exchange left
        # feeds the 1-row min-scalar aggregate, which the gate allows)
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "prmod", PLAN_REPORT_PY
        )
        pr = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(pr)
        executed = out._jdf.queryExecution().executedPlan().toString()
        assert pr.global_windows_over_scans(executed) == []

    def test_relational_tier_high_alpha_skewed_domain(self, spark):
        """alpha near 1 is where the bucketed-prefilter alternative
        stops bounding anything (quota_d ~ n_d): the offsets
        composition must stay exact there. quota_d = floor(n_d^0.9 *
        min_e n_e^0.1) on a deliberately skewed distribution."""
        from bigdata_cookbook_spark.operators.sampling import (
            domain_mix_temperature,
        )

        df = spark.range(3000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 2500, F.lit("mega"))
            .otherwise(F.concat(F.lit("d"), (F.col("id") % 10)))
            .alias("source"),
        )
        out = domain_mix_temperature(
            df, "source", "doc_id", alpha=0.9, relational=True
        )
        per = {
            r.source: r.n
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        import math

        min_f = min(50, 2500) ** 0.1
        assert per["mega"] == math.floor((2500**0.9) * min_f)
        # the tail domains ARE the min domain, so their quota product is
        # boundary-exact in real math (50^0.9 * 50^0.1 = 50.0): a
        # last-ulp difference between the JVM's pow and Python's flips
        # floor(50.0) to 49 — exactly the best-effort hazard the
        # docstring scopes — so assert the documented +/-1 envelope
        # below the boundary instead of bit equality (ADVICE round 10)
        assert all(
            v in (49, 50) for k, v in per.items() if k != "mega"
        ), per

    def test_tier_parity_at_non_half_alpha(self, spark, sf_dir):
        """ADVICE (round 9): the bit-for-bit tier-parity claim is scoped
        to alpha=0.5 (IEEE-exact sqrt); at other alpha the Python
        c**alpha and JVM pow may differ in the last ulp, so agreement
        is best-effort. This pins that on the real corpus the tiers DO
        agree at alpha=0.3 — a divergence would show up as a one-row
        set difference at a quota boundary, which the docstring
        documents as the failure mode."""
        from bigdata_cookbook_spark.operators.sampling import (
            domain_mix_temperature,
        )

        docs = load_table(spark, sf_dir, "documents")
        a = {
            r.doc_id
            for r in domain_mix_temperature(
                docs, "source", "doc_id", alpha=0.3
            ).select("doc_id").collect()
        }
        b = {
            r.doc_id
            for r in domain_mix_temperature(
                docs, "source", "doc_id", alpha=0.3, relational=True
            ).select("doc_id").collect()
        }
        assert a == b and a

    def test_relational_tier_fails_loud_on_null_domains(self, spark):
        from bigdata_cookbook_spark.operators.sampling import (
            domain_mix_temperature,
        )

        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, None), (4, "b")],
            "doc_id long, source string",
        )
        with pytest.raises(Exception) as ei:
            domain_mix_temperature(
                df, "source", "doc_id", alpha=0.5, relational=True
            ).collect()
        assert "NULL" in str(ei.value) or "null" in str(ei.value)

    def test_collected_tier_collect_is_bounded(self, spark):
        """domain_mix_sample's count collect must be bounded by the
        share keys, not the corpus's domain cardinality: mixing two
        named sources out of 300 distinct domains works without
        tripping any scale concern (the other 299 never reach the
        driver)."""
        from bigdata_cookbook_spark.operators.sampling import (
            domain_mix_sample,
        )

        df = spark.range(900).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 300, F.lit("keep_a"))
            .when(F.col("id") < 600, F.lit("keep_b"))
            .otherwise(F.concat(F.lit("noise"), F.col("id")))
            .alias("source"),
        )
        out = domain_mix_sample(
            df, "source", "doc_id", {"keep_a": 0.5, "keep_b": 0.5}
        )
        per = {
            r.source: r.n
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert per == {"keep_a": 300, "keep_b": 300}
