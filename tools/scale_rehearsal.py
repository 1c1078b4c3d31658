"""Scale rehearsal (round-4 VERDICT item 1): run the headline set plus
the training-data tier across scale factors — the driver's sf0.01/sf0.1
tiers and the locally generated sf1 (tools/gen_scale_data.py, 10x the
bench tier) — and emit the per-query scaling curve.

The point is direct evidence for the "plans you'd want at 100x" claim:
for each query, time t(sf) at sf ∈ {0.01, 0.1, 1} and the step ratios
r10 = t(0.1)/t(0.01), r100 = t(1)/t(0.1). Data grows 10x per step, so a
scale-healthy operator shows r <= ~10 once it outgrows Spark's fixed
job floor (~0.1-0.3 s, which makes small-SF ratios look flat); r well
above 10 on the sf0.1 -> sf1 step flags super-linear behavior worth a
plan audit.

Methodology matches bench.py: one session, AQE on, tables cached and
materialized outside the timer per SF (shared-scan position), DataFrame
built once, min-of-3 noop-sink runs per query. comention_parts runs its
plain (non-bucketed) registry form here — same kernel at every SF, so
the CURVE is apples-to-apples even though the bench's bucketed layout
is faster in absolute terms.

Timing caveat (round-6 finding): the DataFrame is built OUTSIDE the
timer, so queries whose construction runs an eager fixpoint — the
connected-components tier (neardup_canonical_clusters,
cluster_safe_split_docs): dedup_clusters' label-propagation loop
count()s per round — are timed only on their POST-fixpoint execution
here. Their rows measure the final join, not the clustering; the
honest end-to-end numbers (construction + execution) are recorded in
BASELINE.md §F's round-6 table. Kept as-is so the curve stays
comparable across rounds; every non-iterative query is unaffected
(construction is pure plan building).

Usage: python tools/scale_rehearsal.py [out.json]
       SPARK_GRAFT_SF1_DIR=.scale/sf1 to point at a different sf1 copy.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import HEADLINE, bench_session

# the training-data tier beyond bench.py's HEADLINE — dedup/ANN/corpus
# families the 100 TB story leans on, each a registry query
TIER = [
    "corpus_clean",
    "training_shuffle",
    "domain_mix_sample",
    "benchmark_contamination",
    "char_bigram_perplexity",
    "bpe_token_count",
    "gopher_quality",
    "pii_redaction",
    "token_window_chunks",
    "sequence_pack",
    "ngram_jaccard_capped",
    "neardup_canonical_clusters",
    "bm25_topk",
    "hybrid_search_rrf",
    "ann_lsh_buckets",
    "continuous_aggregate_daily",
    "skew_salted_distinct_users",
    # round-4 additions
    "gopher_repetition",
    "semantic_dedup",
    "span_dedup",
    # the auto-plane default path; the plain semantic_dedup row is the
    # deliberately-dense fixed-plane oracle form (BASELINE.md §E)
    "semantic_dedup_auto",
    # round-5/6 additions
    "line_dedup",
    "compression_ratio",
    "cluster_safe_split_docs",
    "domain_mix_temperature",
    "shard_pack_documents",
    # round-6 second wave (sf1/sf10 baselines in BASELINE.md §F)
    "quality_prune_per_source",
    "contamination_bloom",
    "neardup_keep_best",
    # round-7 additions (r6 VERDICT item 4: the five round-6 operators
    # the curve did not yet cover)
    "html_to_text",
    "script_profile",
    "paragraph_dedup",
    "tfidf_top_terms",
    "sentence_budget_chunks",
    # round-7 additions (first curve rows landed with the round-8 regen)
    "contamination_report",
    "winnow_fingerprints",
    # round-8 additions (first curve rows in the round-8 second regen)
    "url_canonicalize",
    "domain_blocklist_cap",
    "line_filter_clean",
    # round-8 third wave: DSIR selection (fit job + zero-exchange
    # projected scoring; see plan_report ceilings) and BPE pair stats
    "dsir_select_topk",
    "dsir_gumbel_sample",
    "bpe_pair_counts",
]

# super-linear step ratios that are DOCUMENTED-BY-DESIGN (each has a
# linear production tier measured in the same artifact); the flag
# computation exempts exactly these, by name, with the reason recorded
# in the artifact so "zero unexplained flags" is machine-checked
EXEMPT_KNOWN_SUPERLINEAR = {
    "ngram_jaccard_pairs": (
        "exact all-pairs tier is O(n^2) by definition; the df-capped "
        "linear production tier is the ngram_jaccard_capped row"
    ),
    "corpus_clean": (
        "batch form includes the within-corpus exact-dedup self-join "
        "whose candidate set grows quadratically on the synthetic "
        "near-dup-heavy corpus; the incremental/streaming form is the "
        "production tier"
    ),
    "semantic_dedup": (
        "fixed-plane oracle form: bucket occupancy grows with corpus "
        "size at constant plane count (dense by construction); the "
        "auto-scaled production tier is the semantic_dedup_auto row"
    ),
}
#: step ratios are only meaningful once the base time is above Spark's
#: fixed job floor (~0.1-0.3 s scheduling+codegen); a ratio whose base
#: is below this is recorded separately (floor-deflated base), not
#: flagged — the r6 bpe_token_count lesson
FLAG_FLOOR_SEC = 0.25
#: 15.0 = linear growth (10x) + 50% noise headroom. At exactly 10.0 the
#: flag fires on min-of-3 timing noise for any operator just above the
#: floor (round-7 ADVICE): a flag should mean "super-linear beyond what
#: host jitter explains", and genuinely quadratic operators blow far
#: past 15 on a 10x step (ngram_jaccard ~26x, dense semantic_dedup
#: ~30x), so the headroom costs no detection power. At-the-line cases
#: (~10-15x, e.g. the r7 html_to_text 11.06 first pass) remain visible
#: as table rows and are bracketed-re-measured per protocol.
FLAG_RATIO_PER_10X = 15.0

def _sf_dirs() -> list[tuple[str, str]]:
    """Default curve 0.01/0.1/1; override with SPARK_GRAFT_SCALE_SFS
    (comma list, e.g. "0.1,1,10" — <=0.1 resolve to the driver testdata
    tiers, larger to .scale/sf<N> from tools/gen_scale_data.py).
    SPARK_GRAFT_SKIP_QUERIES (comma names) drops queries whose exact
    forms are out of budget at the big tiers (recorded as skipped, not
    silently absent). For >= sf10 set SPARK_GRAFT_DRIVER_MEM=32g —
    the cached tables outgrow the default 8g local-mode heap."""
    spec = os.environ.get("SPARK_GRAFT_SCALE_SFS", "0.01,0.1,1")
    out = []
    for sf in [s.strip() for s in spec.split(",") if s.strip()]:
        if float(sf) <= 0.1:
            out.append((sf, f"/root/testdata/sf{sf}"))
        elif sf == "1":
            out.append((sf, os.environ.get("SPARK_GRAFT_SF1_DIR", ".scale/sf1")))
        else:
            out.append((sf, f".scale/sf{sf}"))
    return out


SFS: list[tuple[str, str]] = _sf_dirs()
SKIP = {
    s.strip()
    for s in os.environ.get("SPARK_GRAFT_SKIP_QUERIES", "").split(",")
    if s.strip()
}


def compute_flags(
    table: list[dict],
    results: dict[str, dict],
    steps: list[tuple[str, str]],
) -> tuple[list[dict], list[dict], list[dict]]:
    """Machine-computed super-linearity flags (r6 VERDICT item 2: the
    "zero super-linear flags" claim must be a property of the ARTIFACT,
    not of a commit message). A step is flagged when its ratio exceeds
    FLAG_RATIO_PER_10X scaled to the step's actual data growth;
    exempt-by-design rows land in exempt_superlinear with their
    documented reason; ratios whose base time is under the fixed job
    floor land in floor_deflated_base (the ratio is arithmetic over
    scheduling noise, not a scale signal — the r6 bpe_token_count
    lesson, where a 0.111 s base tripled the recorded ratio).

    Returns (flagged, exempt_hits, floor_hits); a publishable curve has
    flagged == [].
    """
    flagged, exempt_hits, floor_hits = [], [], []
    for row in table:
        name = row["query"]
        for a, b in steps:
            r = row.get(f"r_{a}_{b}")
            if r is None:
                continue
            thr = FLAG_RATIO_PER_10X * (float(b) / float(a)) / 10.0
            if r <= thr:
                continue
            hit = {"query": name, "step": f"{a}->{b}", "ratio": r}
            if name in EXEMPT_KNOWN_SUPERLINEAR:
                hit["reason"] = EXEMPT_KNOWN_SUPERLINEAR[name]
                exempt_hits.append(hit)
            elif (results.get(name, {}).get(a) or 0) < FLAG_FLOOR_SEC:
                hit["base_sec"] = results.get(name, {}).get(a)
                floor_hits.append(hit)
            else:
                flagged.append(hit)
    return flagged, exempt_hits, floor_hits


#: one-time model fits for the non-registry curve rows, pinned on the
#: sf0.01 tier so every SF scores/encodes with the SAME artifact;
#: falls back to the smallest MEASURED tier when the driver testdata
#: dir is absent (e.g. a SPARK_GRAFT_SCALE_SFS=1,10 run on a host with
#: only the generated .scale tiers)
_FIT_CACHE: dict[str, object] = {}


def _fit_sf_dir() -> str:
    default = "/root/testdata/sf0.01"
    if os.path.isdir(default):
        return default
    for _, sf_dir in SFS:
        if os.path.isdir(sf_dir):
            return sf_dir
    raise SystemExit("no SF dir available to fit the curve models on")


def _bpe_merges(spark, load_table) -> list[tuple[str, str]]:
    if "bpe" not in _FIT_CACHE:
        from bigdata_cookbook_spark.operators.bpe import train_bpe

        docs = load_table(spark, _fit_sf_dir(), "documents").select("text")
        _FIT_CACHE["bpe"] = train_bpe(docs, n_merges=200)
    return _FIT_CACHE["bpe"]


def _quality_model(spark, load_table) -> tuple[list[float], float]:
    if "quality" not in _FIT_CACHE:
        from pyspark.sql import functions as F

        from bigdata_cookbook_spark.ml.quality_classifier import (
            train_quality_classifier,
        )

        docs = load_table(spark, _fit_sf_dir(), "documents").select(
            "doc_id", "text"
        )
        # synthetic reference-vs-crawl split by doc-id hash parity: the
        # labels are arbitrary — the curve measures the SCORING fold's
        # cost, which depends only on n_buckets and text length
        parity = F.crc32(F.col("doc_id").cast("string")) % 2 == 0
        _FIT_CACHE["quality"] = train_quality_classifier(
            docs.filter(parity).select("text"),
            docs.filter(~parity).select("text"),
            n_buckets=1024,
            max_iter=20,
        )
    return _FIT_CACHE["quality"]


def _run_deterministic_shuffle_write(spark, load_table, sf_dir: str) -> float:
    """deterministic_shuffle as it ships training data: the range
    exchange + local sort MOVING THE CORPUS (doc text rides along),
    min-of-3 noop-sink runs of a prebuilt plan — the serving write the
    training_shuffle registry row (slim global_rank projection) does
    not cover."""
    from bigdata_cookbook_spark.operators.sampling import deterministic_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = deterministic_shuffle(docs, "doc_id")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    return round(min(times), 3)


def _run_cluster_safe_split_e2e(spark, load_table, sf_dir: str) -> float:
    """cluster_safe_split END TO END: the connected-components fixpoint
    (dedup_clusters' label-propagation loop — eager count()s during
    construction) runs INSIDE the timer, unlike the registry row whose
    prebuilt DataFrame times only the post-fixpoint assignment join.
    Min-of-3 full construct+execute repetitions."""
    from bigdata_cookbook_spark.operators.dedup import minhash_lsh_candidates
    from bigdata_cookbook_spark.operators.sampling import cluster_safe_split

    docs = load_table(spark, sf_dir, "documents")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        pairs = minhash_lsh_candidates(docs, num_hashes=12, band_size=2)
        out = cluster_safe_split(
            docs.select("doc_id"),
            pairs,
            "doc_id",
            {"train": 0.8, "val": 0.1, "test": 0.1},
        )
        out.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    return round(min(times), 3)


def _run_domain_mix_relational_skewed(spark, load_table, sf_dir: str) -> float:
    """The relational temperature-mix tier on a deliberately skewed
    registered-domain-like key: one mega-domain holds a third of the
    corpus, the rest spreads over ~20k long-tail domains — over the
    collected tier's guard AND maximally skewed. The round-10 offsets
    composition bounds every task by partition size here; the previous
    per-domain row_number window would have pushed the mega-domain
    through one task. Construction — including the one-job emptiness
    probe — runs OUTSIDE the timer: the min-of-3 repetitions time
    prepared-plan execution only, the same position as the registry
    rows."""
    from pyspark.sql import functions as F

    from bigdata_cookbook_spark.operators.sampling import domain_mix_temperature

    docs = load_table(spark, sf_dir, "documents")
    skewed = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("mega.example"))
        .otherwise(F.concat(F.lit("d"), (F.col("doc_id") % 20011)))
        .alias("domain"),
    )
    out = domain_mix_temperature(
        skewed, "domain", "doc_id", alpha=0.5, relational=True
    )
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    return round(min(times), 3)


def _run_corpus_clean_lsh(spark, load_table, sf_dir: str) -> float:
    """corpus_clean with near_dup='lsh' (round 10): the production
    near-dup funnel — MinHash band candidates + exact verify on the
    candidates only — in place of the inverted-index self-join that
    makes the plain corpus_clean row exempt-superlinear. The linear
    counterpart row: candidate generation is bucketed, verification is
    bounded by |candidates| x shingles/doc."""
    from bigdata_cookbook_spark.operators.corpus import corpus_clean

    docs = load_table(spark, sf_dir, "documents")
    out = corpus_clean(docs, near_dup="lsh")["kept"]
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    return round(min(times), 3)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING.json"
    spark = bench_session()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = HEADLINE + [q for q in TIER if q not in HEADLINE]

    from bigdata_cookbook_spark.sources.testdata import TABLES, load_table

    results: dict[str, dict[str, float]] = {n: {} for n in names}
    for sf, sf_dir in SFS:
        if not os.path.isdir(sf_dir):
            print(f"-- skipping sf{sf}: {sf_dir} missing", file=sys.stderr)
            continue
        cached = []
        for tbl in TABLES:
            df = load_table(spark, sf_dir, tbl)
            df.cache()
            df.write.format("noop").mode("overwrite").save()
            cached.append(df)
        for name in names:
            if name in SKIP:
                results[name][f"err_{sf}"] = "skipped (SPARK_GRAFT_SKIP_QUERIES)"
                print(f"sf{sf} {name}: SKIPPED", file=sys.stderr, flush=True)
                continue
            # a query that breaks at a higher SF is itself a rehearsal
            # FINDING (that is the point of the exercise) — record it and
            # keep measuring the rest instead of losing the whole run
            try:
                df = qs[name](spark, sf_dir)
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    times.append(time.perf_counter() - t0)
                results[name][sf] = round(min(times), 3)
                print(f"sf{sf} {name}: {results[name][sf]}", file=sys.stderr, flush=True)
            except Exception as exc:  # noqa: BLE001
                results[name][sf] = None
                results[name][f"err_{sf}"] = f"{type(exc).__name__}: {exc}"[:300]
                print(f"sf{sf} {name}: FAILED {type(exc).__name__}", file=sys.stderr, flush=True)
        # WebDataset sink -> source round-trip (not a registry query:
        # the sink writes real tars; timed against a scratch dir).
        # Write = pack_shards + tar emit, forced by the manifest;
        # read = whole-tar binaryFile ingest + untar to member rows.
        if "webdataset_roundtrip" not in SKIP:
            import shutil
            import tempfile

            from pyspark.sql import functions as F

            from bigdata_cookbook_spark.operators.sampling import pack_shards
            from bigdata_cookbook_spark.sinks import write_webdataset_shards
            from bigdata_cookbook_spark.sources.webdataset import read_webdataset

            results.setdefault("webdataset_write", {})
            results.setdefault("webdataset_read", {})
            # phase tracks which row an error belongs to: a failure
            # during the READ pass must land on webdataset_read, not
            # misattribute to the write row (round-7 ADVICE)
            phase = "webdataset_write"
            try:
                docs = load_table(spark, sf_dir, "documents").select(
                    "doc_id", "text", F.octet_length("text").alias("nb")
                )
                wtimes, rtimes = [], []
                for _ in range(3):
                    run_dir = tempfile.mkdtemp(prefix="wds_rehearsal_")
                    try:
                        phase = "webdataset_write"
                        packed = pack_shards(
                            docs, ["doc_id"], "nb", shard_bytes=4 << 20
                        )
                        sink = write_webdataset_shards(packed, run_dir)
                        t0 = time.perf_counter()
                        sink.write.format("noop").mode("overwrite").save()
                        wtimes.append(time.perf_counter() - t0)
                        phase = "webdataset_read"
                        back = read_webdataset(spark, run_dir)
                        t0 = time.perf_counter()
                        back.write.format("noop").mode("overwrite").save()
                        rtimes.append(time.perf_counter() - t0)
                    finally:
                        shutil.rmtree(run_dir, ignore_errors=True)
                results["webdataset_write"][sf] = round(min(wtimes), 3)
                results["webdataset_read"][sf] = round(min(rtimes), 3)
                print(
                    f"sf{sf} webdataset write/read: "
                    f"{results['webdataset_write'][sf]}/"
                    f"{results['webdataset_read'][sf]}",
                    file=sys.stderr,
                    flush=True,
                )
            except Exception as exc:  # noqa: BLE001
                results[phase][f"err_{sf}"] = (
                    f"{type(exc).__name__}: {exc}"[:300]
                )
                print(
                    f"sf{sf} webdataset ({phase}): FAILED {type(exc).__name__}",
                    file=sys.stderr,
                    flush=True,
                )
        # BPE encoding + learned quality gate (round-8 VERDICT item 7:
        # the two operators whose HEAVY path — Arrow-batched encode with
        # the per-batch word cache; collected-weights codegen fold —
        # was pytest-pinned but not yet on the measured curve). Neither
        # is a registry query (no DuckDB oracle applies to learned
        # artifacts — the ml/lsh.py compromise), so they time here like
        # the WebDataset round-trip. The MODELS are fit ONCE on the
        # sf0.01 tier and pinned across SFs, so each curve isolates the
        # map-only scoring/encoding stage, not fit drift.
        results.setdefault("bpe_encode", {})
        results.setdefault("quality_gate", {})
        if "bpe_encode" in SKIP:
            # same recorded-not-silently-absent contract as the
            # registry loop above
            results["bpe_encode"][f"err_{sf}"] = "skipped (SPARK_GRAFT_SKIP_QUERIES)"
            print(f"sf{sf} bpe_encode: SKIPPED", file=sys.stderr, flush=True)
        else:
            try:
                from bigdata_cookbook_spark.operators.bpe import bpe_encode
                from bigdata_cookbook_spark.sources.testdata import (
                    spread_for_cpu_bound,
                )

                # CPU-bound Arrow battery over raw text: spread the scan
                # to core count (no-op on a wide scan — the 100 TB shape;
                # at sf10 the 15-split local scan otherwise runs a
                # straggler tail, measured 12.6x -> ~10x per 10x)
                docs = spread_for_cpu_bound(
                    load_table(spark, sf_dir, "documents").select(
                        "doc_id", "text"
                    )
                )
                enc = bpe_encode(docs, _bpe_merges(spark, load_table))
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    enc.write.format("noop").mode("overwrite").save()
                    times.append(time.perf_counter() - t0)
                results["bpe_encode"][sf] = round(min(times), 3)
                print(
                    f"sf{sf} bpe_encode: {results['bpe_encode'][sf]}",
                    file=sys.stderr,
                    flush=True,
                )
            except Exception as exc:  # noqa: BLE001
                results["bpe_encode"][f"err_{sf}"] = (
                    f"{type(exc).__name__}: {exc}"[:300]
                )
                print(
                    f"sf{sf} bpe_encode: FAILED {type(exc).__name__}",
                    file=sys.stderr,
                    flush=True,
                )
        if "quality_gate" in SKIP:
            results["quality_gate"][f"err_{sf}"] = "skipped (SPARK_GRAFT_SKIP_QUERIES)"
            print(f"sf{sf} quality_gate: SKIPPED", file=sys.stderr, flush=True)
        else:
            try:
                from bigdata_cookbook_spark.ml.quality_classifier import (
                    quality_gate,
                )
                from bigdata_cookbook_spark.sources.testdata import (
                    spread_for_cpu_bound,
                )

                docs = spread_for_cpu_bound(
                    load_table(spark, sf_dir, "documents").select(
                        "doc_id", "text"
                    )
                )
                w, b = _quality_model(spark, load_table)
                gated = quality_gate(docs, w, b, threshold=0.0)
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    gated.write.format("noop").mode("overwrite").save()
                    times.append(time.perf_counter() - t0)
                results["quality_gate"][sf] = round(min(times), 3)
                print(
                    f"sf{sf} quality_gate: {results['quality_gate'][sf]}",
                    file=sys.stderr,
                    flush=True,
                )
            except Exception as exc:  # noqa: BLE001
                results["quality_gate"][f"err_{sf}"] = (
                    f"{type(exc).__name__}: {exc}"[:300]
                )
                print(
                    f"sf{sf} quality_gate: FAILED {type(exc).__name__}",
                    file=sys.stderr,
                    flush=True,
                )
        # round-10 additions (r9 VERDICT items 2+6): the training-serving
        # paths without curve rows, timed the way they misbehave first at
        # scale — deterministic_shuffle's RANGE-EXCHANGE WRITE moving the
        # corpus (training_shuffle's registry row ranks a slim projection
        # instead), cluster_safe_split END TO END with the components
        # FIXPOINT inside the timer (the registry row times post-fixpoint
        # execution only — module docstring caveat), and the relational
        # domain-mix tier on a deliberately skewed high-cardinality
        # domain distribution (one mega-domain holding a third of the
        # corpus over ~20k long-tail domains — the shape the round-10
        # offsets-composition rank exists for).
        extras = {
            "deterministic_shuffle_write": _run_deterministic_shuffle_write,
            "cluster_safe_split_e2e": _run_cluster_safe_split_e2e,
            "domain_mix_relational_skewed": _run_domain_mix_relational_skewed,
            "corpus_clean_lsh": _run_corpus_clean_lsh,
        }
        for ename, fn in extras.items():
            results.setdefault(ename, {})
            if ename in SKIP:
                results[ename][f"err_{sf}"] = "skipped (SPARK_GRAFT_SKIP_QUERIES)"
                print(f"sf{sf} {ename}: SKIPPED", file=sys.stderr, flush=True)
                continue
            try:
                results[ename][sf] = fn(spark, load_table, sf_dir)
                print(
                    f"sf{sf} {ename}: {results[ename][sf]}",
                    file=sys.stderr,
                    flush=True,
                )
            except Exception as exc:  # noqa: BLE001
                results[ename][f"err_{sf}"] = f"{type(exc).__name__}: {exc}"[:300]
                print(
                    f"sf{sf} {ename}: FAILED {type(exc).__name__}",
                    file=sys.stderr,
                    flush=True,
                )
        for df in cached:
            df.unpersist()
        spark.catalog.clearCache()

    # step ratios between CONSECUTIVE measured SFs (generic over the
    # SPARK_GRAFT_SCALE_SFS list)
    steps = [(SFS[i][0], SFS[i + 1][0]) for i in range(len(SFS) - 1)]
    table = []
    all_names = names + [n for n in results if n not in names]
    for name in all_names:
        r = results[name]
        row = {"query": name, **{f"sf{sf}": r.get(sf) for sf, _ in SFS}}
        for a, b in steps:
            if r.get(b) and r.get(a):
                row[f"r_{a}_{b}"] = round(r[b] / r[a], 2)
        err = {k: v for k, v in r.items() if k.startswith("err_")}
        row.update(err)
        # a row with NO timing at any measured SF must say why (r10
        # VERDICT: the artifact alone showed a hole, not a decision)
        if not err and all(row.get(f"sf{sf}") is None for sf, _ in SFS):
            row["skipped"] = (
                "exempt-superlinear oracle tier, out of budget at these "
                "SFs (BASELINE.md §D): " + EXEMPT_KNOWN_SUPERLINEAR[name]
                if name in EXEMPT_KNOWN_SUPERLINEAR
                else "not measured at these SFs"
            )
        table.append(row)

    flagged, exempt_hits, floor_hits = compute_flags(table, results, steps)
    with open(out_path, "w") as f:
        json.dump(
            {
                "unit": "sec",
                "min_of": 3,
                "flag_ratio_per_10x": FLAG_RATIO_PER_10X,
                "flag_floor_sec": FLAG_FLOOR_SEC,
                "flagged": flagged,
                "exempt_superlinear": exempt_hits,
                "floor_deflated_base": floor_hits,
                "rows": table,
            },
            f,
            indent=1,
        )
    print(
        json.dumps(
            {
                "wrote": out_path,
                "queries": len(table),
                "flagged": flagged,
                "exempt": [h["query"] for h in exempt_hits],
                "floor_deflated": [h["query"] for h in floor_hits],
            }
        )
    )

    # markdown table for BASELINE.md
    hdr = (
        "| query | "
        + " | ".join(f"sf{sf}" for sf, _ in SFS)
        + " | "
        + " | ".join(f"t({b})/t({a})" for a, b in steps)
        + " |"
    )
    print("\n" + hdr)
    print("|" + "---|" * (1 + len(SFS) + len(steps)))
    for row in table:
        cells = [row["query"]]
        cells += [str(row.get(f"sf{sf}", "—")) for sf, _ in SFS]
        cells += [str(row.get(f"r_{a}_{b}", "—")) for a, b in steps]
        print("| " + " | ".join(cells) + " |")


if __name__ == "__main__":
    try:
        main()
    finally:
        from pyspark.sql import SparkSession

        from bench import cleanup_scratch

        s = SparkSession.getActiveSession()
        if s is not None:
            cleanup_scratch(s)
