"""Deterministic hash-based sampling & splits (training-data tier).

Training pipelines need samples and train/val/test splits that are
(a) deterministic across reruns — a re-executed stage or a retried task
must pick the same rows, or lineage breaks; (b) portable across engines —
the split computed by the Spark pipeline must be reproducible by any
other system reading the same table; and (c) stable under data growth —
adding new rows never reassigns existing ones. Seeded `df.sample()` gives
none of these (it samples per-partition, so the picked set changes with
partitioning). The standard answer is content hashing: bucket =
md5(id || salt) mod N, sample = bucket < fraction*N.

md5 is used (not xxhash64/Murmur) because every engine speaks it — the
DuckDB oracles reproduce the exact row sets, which is the portability
property itself under test. At 100 TB the hash costs one pass over the
id column, no shuffle at all: sampling/splitting is a pure narrow map.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000


def hash_bucket(col: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, N_BUCKETS) from a column's content.

    First 8 hex chars of md5 → int → mod. The salt derives independent
    bucketings from the same ids (e.g. a sample within a split).
    """
    h = F.md5(F.encode(F.concat(col.cast("string"), F.lit(salt)), "UTF-8"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % N_BUCKETS).alias(
        "bucket"
    )


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~fraction of rows, chosen by content hash of id_col."""
    return df.filter(hash_bucket(F.col(id_col), salt) < int(fraction * N_BUCKETS))


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by cumulative hash-bucket ranges.

    fractions: ordered {name: fraction}; must sum to 1 (±1 bucket of
    rounding goes to the last split). E.g. {"train": .8, "val": .1,
    "test": .1}. Row→split assignment depends only on (id, salt): new
    rows never move existing ones, and any engine can recompute it.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = hash_bucket(F.col(id_col), salt)
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = bucket < int(cum * N_BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn(split_col, expr)


def cluster_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "",
    split_col: str = "split",
    pair_cols: tuple[str, str] = ("doc_a", "doc_b"),
) -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicate CLUSTERS are
    assigned to splits atomically, so no near-dup pair ever straddles a
    split boundary.

    A plain per-document hash_split leaks: if doc A (train) and doc B
    (test) are near-duplicates, the model has effectively seen the test
    document — the contamination the dedup tier exists to prevent,
    reintroduced at split time. Here every document first resolves to
    its near-dup cluster's canonical id (connected components over the
    candidate pairs, min-id representative — operators/graph.py
    dedup_clusters), and the hash_split rule is applied to the
    CANONICAL id: every member of a cluster hashes identically, so the
    whole cluster lands in one split. Documents with no dup edge are
    their own canonical and split exactly as hash_split would.

    Inherits hash_split's contracts on the cluster level: deterministic
    across reruns and engines, stable under data growth (a new member
    joining an existing cluster adopts the cluster's split; it can
    never move the cluster). Cost at scale: the components fixpoint is
    shared with the dedup tier that produced the pairs; the split
    itself is a pure hash; the assignment reaches the fact rows through
    one equi-join shuffle on the high-cardinality id column.

    Output: df's columns + canonical_id + split_col.
    """
    from bigdata_cookbook_spark.operators.graph import dedup_clusters

    canon = dedup_clusters(pairs, df.select(id_col), id_col, pair_cols)
    assigned = hash_split(canon, "canonical_id", fractions, salt, split_col)
    return df.join(
        assigned.select(id_col, "canonical_id", split_col), id_col
    )


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling with stratum-specific rates.

    fractions maps stratum value → keep fraction; strata not listed keep
    default_fraction. The hash rule is shared with hash_sample, so a
    stratum at fraction f keeps exactly the rows hash_sample(f) would.
    """
    bucket = hash_bucket(F.col(id_col), salt)
    threshold = None
    for value, frac in fractions.items():
        cond = F.col(strata_col) == value
        lit_t = F.lit(int(frac * N_BUCKETS))
        threshold = (
            F.when(cond, lit_t) if threshold is None else threshold.when(cond, lit_t)
        )
    threshold = (
        F.lit(int(default_fraction * N_BUCKETS))
        if threshold is None
        else threshold.otherwise(int(default_fraction * N_BUCKETS))
    )
    return df.filter(bucket < threshold)


def weighted_hash_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Deterministic Bernoulli sampling with inclusion probability
    proportional to a weight column (importance sampling): p_i = min(1,
    fraction * w_i / avg(w)), decided by the same content-hash bucket as
    hash_sample. Expected sample size ~ fraction * n when few weights
    clip at 1. The per-row threshold is rounded to 6 dp BEFORE the bucket
    comparison so engines computing avg(w) in different summation orders
    still draw the same boundary (the oracle mirrors the rounding).
    One aggregation (the scalar mean) + a narrow map — no shuffle of df.
    """
    mean_w = float(df.agg(F.avg(weight_col)).first()[0])
    p = F.least(
        F.lit(1.0), F.lit(float(fraction)) * F.col(weight_col) / F.lit(mean_w)
    )
    threshold = F.floor(F.round(p * N_BUCKETS, 6)).cast("long")
    return df.filter(hash_bucket(F.col(id_col), salt) < threshold)


def shuffle_key(col: Column, seed: int = 42) -> Column:
    """Deterministic pseudo-random sort key: md5 over (id ':' seed).

    The training-data global shuffle: ordering by this key is a uniform
    permutation of the corpus that is reproducible across engines and
    reruns and stable under appends (new rows interleave without moving
    existing relative order). Different seeds give independent epochs.
    """
    return F.md5(
        F.encode(F.concat(col.cast("string"), F.lit(f":{seed}")), "UTF-8")
    ).alias("shuffle_key")


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int = 42,
    n_output_partitions: int | None = None,
) -> DataFrame:
    """Globally shuffle a corpus for training-data serving.

    Adds ``shuffle_key`` (md5 of id+seed) and range-partitions + sorts by
    it: the written files enumerate the corpus in deterministic
    pseudo-random order with NO single-point global sort — range
    partitioning samples boundaries, then each partition sorts locally
    (the standard Spark total-order path, ~linear at 100 TB). Readers
    stream partitions in index order for a full permutation, or any
    subset of partitions for an unbiased sample.
    """
    out = df.withColumn("shuffle_key", shuffle_key(F.col(id_col), seed))
    n = n_output_partitions or df.sparkSession.sparkContext.defaultParallelism
    return out.repartitionByRange(n, "shuffle_key", id_col).sortWithinPartitions(
        "shuffle_key", id_col
    )


def global_rank(
    df: DataFrame,
    order_by: list[Column | str],
    rank_col: str = "rank",
    n_partitions: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """Total-order 1-based rank with NO single-reducer window — the
    distributed equivalent of ``row_number().over(Window.orderBy(...))``.

    A partitionless window forces the whole input through one task
    (Exchange SinglePartition) — the plan shape tools/plan_report.py
    red-flags on fact tables. This operator realizes the identical rank
    values scale-correctly: range-partition + local sort (the standard
    Spark total-order path — sampled boundaries, every partition sorts
    in parallel), then ``monotonically_increasing_id`` reads off the
    within-partition position JVM-side (rows stream out of the sort in
    order; id = pid<<33 | local_index), and a partition-count aggregate
    (tiny: one row per partition) yields broadcast cumulative offsets.
    rank = offset(pid) + local_index + 1. Rank values are independent of
    where the sampled range boundaries fall because the ordering is
    total — ``order_by`` MUST be a total order (include an id
    tiebreaker), or ranks within ties become partition-layout-dependent.

    The fact table moves through exactly ONE shuffle (the range
    exchange); the offsets branch re-reads that shuffle's files and
    aggregates to partition-count scale. Per-partition row counts are
    bounded by 2^33 (the monotonic-id local field) — at 8.6B rows per
    partition you have a partitioning problem long before an id one.

    ``total_col``: also attach the global row count (needed e.g. by the
    exact-ntile formula in operators/corpus.length_curriculum).
    """
    sess = df.sparkSession
    n = n_partitions or sess.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    parted = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
    tagged = parted.withColumn("__mid", F.monotonically_increasing_id())
    local = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
    counts = tagged.groupBy(F.shiftright("__mid", 33).alias("__pid")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    from pyspark.sql import Window

    w_run = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    off_cols = [
        F.col("__pid"),
        (F.sum("__n").over(w_run) - F.col("__n")).alias("__off"),
    ]
    if total_col is not None:
        off_cols.append(
            F.sum("__n").over(Window.partitionBy(F.lit(1))).alias(total_col)
        )
    offsets = counts.select(*off_cols)
    joined = tagged.join(
        F.broadcast(offsets), F.shiftright("__mid", 33) == F.col("__pid"), "inner"
    )
    keep = [c for c in df.columns]
    out_cols = keep + [(F.col("__off") + local + 1).alias(rank_col)]
    if total_col is not None:
        out_cols.append(F.col(total_col))
    return joined.select(*out_cols)


def pack_shards(
    df: DataFrame,
    order_by: list[Column | str],
    bytes_col: str,
    shard_bytes: int,
    shard_col: str = "shard_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """Assign rows to byte-targeted output shards: shard k holds the
    contiguous run of rows (in ``order_by`` order) whose cumulative
    byte offset starts in [k*shard_bytes, (k+1)*shard_bytes) — the
    training-shard writer's packing rule (shards of ~N bytes each,
    document boundaries respected, order preserved so a
    curriculum/shuffle order carries into the shard sequence).

    shard_id = bytes_before_row DIV shard_bytes, where bytes_before is
    the exact global prefix sum of ``bytes_col`` in the total order —
    computed WITHOUT a single-reducer window, by the global_rank
    mechanics: range-partition + local sort (the one shuffle the fact
    table pays), per-partition byte totals aggregated to
    partition-count scale and broadcast back as offsets, and the
    within-partition running sum under a pid-partitioned window (every
    partition sums in parallel). A row larger than shard_bytes CLOSES
    its shard: the successor starts past the next boundary, so the
    oversized doc shares its shard only with the rows that preceded it
    there, and the skipped-over shard ids are simply unoccupied — the
    packing degrades gracefully instead of splitting the document.

    ``order_by`` MUST be a total order (include an id tiebreaker) or
    prefix sums at ties become partition-layout-dependent. After the
    assignment, ``df.write.partitionBy(shard_col)`` (or a repartition
    on shard_col) realizes the physical shards.

    Scale contract: call with a SLIM (id, bytes) projection and join
    shard_id back to the wide frame (or feed the write directly). The
    fact rows move through two balanced shuffles — the range exchange
    and the pid-partitioned running-sum window (each physical partition
    relocates wholesale to one reducer: perfectly even by
    construction) — so with the slim projection a 10^10-document corpus
    shuffles ~2x16 bytes/row while the document text never moves. The
    offsets side-branch re-scans the slim source and aggregates to
    partition-count scale before broadcasting (same shape as
    global_rank).
    """
    if shard_bytes <= 0:
        raise ValueError(f"shard_bytes must be positive, got {shard_bytes}")
    sess = df.sparkSession
    n = n_partitions or sess.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    parted = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
    tagged = parted.withColumn("__mid", F.monotonically_increasing_id())
    pid = F.shiftright("__mid", 33)
    per_part = tagged.groupBy(pid.alias("__pid")).agg(
        F.sum(bytes_col).alias("__pbytes")
    )
    from pyspark.sql import Window

    w_run = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = per_part.select(
        "__pid", (F.sum("__pbytes").over(w_run) - F.col("__pbytes")).alias("__off")
    )
    w_local = Window.partitionBy(pid).orderBy("__mid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local_before = F.sum(bytes_col).over(w_local) - F.col(bytes_col)
    joined = tagged.join(F.broadcast(offsets), pid == F.col("__pid"), "inner")
    before = (F.col("__off") + local_before).cast("long")
    # integer DIV: exact at any scale (float division of huge byte
    # offsets could round across a shard boundary)
    return joined.withColumn("__before", before).select(
        *[c for c in df.columns],
        F.expr(f"__before DIV {int(shard_bytes)}").alias(shard_col),
    )


def domain_mix_temperature(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    alpha: float = 0.5,
    salt: str = ":mix",
    max_domains: int = 10_000,
    relational: bool = False,
) -> DataFrame:
    """Temperature-based domain mixing: target share of domain d is
    proportional to count_d^alpha (the multilingual/multi-domain
    alpha-sampling rule — alpha=1 keeps natural proportions, alpha=0
    forces uniform, alpha~0.5 upweights small domains without drowning
    large ones). The selected rows are the largest corpus realizing
    those shares without replication, chosen by the same deterministic
    md5-rank rule as domain_mix_sample.

    Quota math, engine-portable by construction: share_d = n_d^alpha
    and n_out = min_d(n_d / share_d) = min_d(n_d^(1-alpha)), so
    quota_d = floor(n_d^alpha * min_e(n_e^(1-alpha))) — no float SUM
    anywhere (summation order is engine-dependent; products and
    roots are single correctly-rounded IEEE ops). For alpha=0.5 both
    factors are sqrt(), which IEEE 754 requires to be exactly rounded,
    so any engine recomputes bit-identical quotas from the counts.

    Same snapshot contract as domain_mix_sample: quota-plus-rank
    selection is not append-stable; pin the corpus snapshot for a
    frozen training set.

    Two quota tiers, same selection rule:

    - default (``relational=False``): the per-domain counts are
      COLLECTED and quotas rebuilt as a broadcast literal table — the
      right plan for source/language mixing (10s-100s of domains).
      Guarded by ``max_domains`` (fail loud, never a silent
      multi-million-row driver pull): keying the mix by
      ``registered_domain`` (functions/url.py — millions of keys at
      100 TB) trips the guard and points here.
    - ``relational=True``: no count collect anywhere — the quota table
      stays a DataFrame (one aggregate), the min scalar
      ``min_e n_e^(1-a)`` is a broadcast 1-row cross join, and the
      NULL-domain fail-loud check rides inside the quota expression
      (raise_error at execution). The only construction-time action is
      a limit-1 emptiness probe, preserving the collected tier's
      fail-loud-on-empty contract (a lazy empty join cannot raise).
      The 100 TB registered-domain tier.

    Both tiers compute quota_d = floor(n_d^alpha * min_e(n_e^(1-alpha)))
    — for alpha=0.5 both factors are sqrt(), exactly rounded in IEEE
    754, so the tiers (and any engine) agree bit-for-bit (parity
    tested at alpha=0.5). For other alpha the two factors are pow(),
    which IEEE 754 does NOT require exactly rounded: Python's ``c **
    alpha`` and the JVM's ``Math.pow`` may differ in the last ulp, and
    a quota sitting exactly on an integer boundary can then differ by
    one, shifting one row at the selection edge. Best-effort agreement
    (pinned by a non-0.5 parity test on this corpus); for a
    cross-engine contract at arbitrary alpha, snapshot the quota table.

    Plan shape, collected tier: one count aggregate, one window rank
    per domain, broadcast quota-join filter — the fact table shuffles
    once on the domain key. Fine at bounded cardinality because no
    single domain is allowed to dominate the corpus there.

    Plan shape, relational tier: the registered-domain key is BOTH
    high-cardinality AND maximally skewed (one crawl domain can be ~1%
    of a 100 TB corpus), so a per-domain ``row_number`` window —
    whose partition spec puts every row of a domain through ONE task —
    is a scale-killer precisely on the tier built for that key. The
    rank is instead realized by the global_rank offsets mechanics
    composed per-domain, with NO rank window over fact rows anywhere:

      1. one range exchange on (domain, md5key, id) + local sort — a
         giant domain spreads across as many partitions as its size
         demands, every task bounded by partition size, never by n_d;
      2. ``monotonically_increasing_id`` reads each row's position off
         the sorted stream JVM-side (id = pid<<33 | local_index);
      3. a map-side-combined aggregate per (pid, domain) of (count,
         first local index) — tiny output: domains are contiguous in
         the range order, so it holds ~n_domains + n_partitions rows;
      4. per-domain cumulative offsets via a running-sum window OVER
         THAT SMALL TABLE (group size <= n_partitions by construction
         — a giant domain contributes at most one row per partition);
      5. rank = offset(pid, domain) + (local_index - first_index) + 1,
         exact because a domain's rows are contiguous within each
         sorted partition and monotonic ids are consecutive there;
      6. quota joins onto the SMALL offsets table (never a second
         fact-side shuffle on the skewed domain key), and the fact
         rows join that combined table once on (pid, domain) — a key
         whose groups are bounded by partition size, so even the join
         is skew-immune; AQE broadcasts it while it fits.

    Ranks are identical to ``row_number() over (partition by domain
    order by md5key, id)`` — the order is total, so they do not depend
    on where the sampled range boundaries land — and the selection is
    therefore bit-identical to the collected tier's (same caveats as
    the quota math above). The fact table pays the range exchange, the
    (pid, domain) aggregate's map-side-combined shuffle of the tiny
    grouped set, and the join — each balanced regardless of domain
    skew. The two-phase bucketed-rank alternative (q_domain_blocklist_cap's
    prefilter) was considered and rejected here: its phase-1 window
    partitions by (domain, id%B), which still pushes n_d/B rows of a
    giant domain through one task, and at high alpha (quota_d ~ n_d)
    its prefilter stops bounding phase 2 at all; the offsets
    composition has neither failure mode.
    """
    if not (0.0 <= alpha <= 1.0):
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")

    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy(domain_col).orderBy(
            F.md5(
                F.encode(F.concat(F.col(id_col).cast("string"), F.lit(salt)), "UTF-8")
            ),
            id_col,
        )
    )

    counts_df = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    if relational:
        # fail loud on empty input like the collected tier: an empty
        # quota join would otherwise SILENTLY emit an empty mix (the
        # in-plan raise_error below never evaluates when there are no
        # quota rows). One limit(1) probe job at construction — cheap
        # next to the mix itself.
        if df.select(domain_col).isEmpty():
            raise ValueError("empty input: no domains to mix")
        # no-collect tier: broadcast 1-row min scalar + in-plan guards
        scal = counts_df.agg(
            F.min(F.pow("__n", F.lit(1.0 - alpha))).alias("__n_out"),
            F.max(F.col(domain_col).isNull().cast("int")).alias("__has_null"),
        )
        null_msg = (
            f"{domain_col} contains NULLs; filter or impute the domain "
            "column before mixing"
        )
        qdf = counts_df.crossJoin(F.broadcast(scal)).select(
            domain_col,
            # the NULL fail-loud check lives INSIDE the quota expression
            # so Catalyst cannot prune it away as an unused column
            F.when(
                F.col("__has_null") > 0, F.raise_error(F.lit(null_msg))
            )
            .otherwise(F.floor(F.pow("__n", F.lit(alpha)) * F.col("__n_out")))
            .cast("long")
            .alias("__quota"),
        )
        # skew-bounded per-domain rank: the global_rank offsets
        # mechanics composed per-domain (docstring step list). No rank
        # window ever sees fact rows — the one window below runs over
        # the (pid, domain) aggregate, whose per-domain group size is
        # bounded by the partition COUNT, not by any domain's row count.
        # Deliberately a third instance of the offsets pattern next to
        # global_rank and pack_shards (same file) rather than a shared
        # grouped_rank helper: those two are frozen operators with
        # pinned plan ceilings (PLANS.md) and long driver-green oracle
        # histories, and this variant differs in both grouping (per
        # domain) and what it joins back (quota) — the 30 shared lines
        # are not worth destabilizing two frozen plans for.
        sess = df.sparkSession
        n_parts = sess.sparkContext.defaultParallelism
        key = F.md5(
            F.encode(F.concat(F.col(id_col).cast("string"), F.lit(salt)), "UTF-8")
        )
        parted = (
            df.withColumn("__k", key)
            .repartitionByRange(n_parts, F.col(domain_col), F.col("__k"), F.col(id_col))
            .sortWithinPartitions(domain_col, "__k", id_col)
        )
        tagged = parted.withColumn(
            "__mid", F.monotonically_increasing_id()
        ).withColumn("__pid", F.shiftright("__mid", 33))
        local = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
        groups = tagged.groupBy("__pid", domain_col).agg(
            F.count(F.lit(1)).alias("__gn"),
            F.min(F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))).alias("__first"),
        )
        w_dom = Window.partitionBy(domain_col).orderBy("__pid").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        offsets = groups.select(
            "__pid",
            domain_col,
            "__first",
            (F.sum("__gn").over(w_dom) - F.col("__gn")).alias("__off"),
        )
        # quota rides the SMALL table: the fact side never shuffles on
        # the skewed bare domain key
        combined = offsets.join(qdf, domain_col)
        ranked = tagged.join(combined, ["__pid", domain_col])
        rank_expr = F.col("__off") + (local - F.col("__first")) + F.lit(1)
        # domain-first output, matching the collected tier's column
        # order (its equi-join puts the join key first) so the tiers
        # stay positionally interchangeable
        out_cols = [domain_col] + [c for c in df.columns if c != domain_col]
        return ranked.filter(rank_expr <= F.col("__quota")).select(*out_cols)

    rows = counts_df.limit(max_domains + 1).collect()
    if len(rows) > max_domains:
        # fail loud, never a silent multi-million-row driver collect:
        # registered-domain-keyed mixing belongs on the relational tier
        raise ValueError(
            f"{domain_col} has more than {max_domains} distinct values; "
            "the collected-quota tier is for bounded-cardinality keys "
            "(source/language). Pass relational=True for the no-collect "
            "quota plan, or raise max_domains deliberately."
        )
    counts = {r[0]: r[1] for r in rows}
    if None in counts:
        # fail loud: a null group would shrink n_out (and with it every
        # quota) while the equi-join below silently drops the null rows
        # themselves — the worst of both. Filter or impute first.
        raise ValueError(
            f"{domain_col} contains NULLs ({counts[None]} rows); "
            "filter or impute the domain column before mixing"
        )
    if not counts:
        raise ValueError("empty input: no domains to mix")
    n_out = min(c ** (1.0 - alpha) for c in counts.values())
    quotas = [(d, int((c**alpha) * n_out)) for d, c in counts.items()]
    spark = df.sparkSession
    qdf = spark.createDataFrame(quotas, f"{domain_col} string, __quota long")
    ranked = df.join(F.broadcast(qdf), domain_col).withColumn("__rk", rk)
    return ranked.filter(F.col("__rk") <= F.col("__quota")).drop("__rk", "__quota")


def domain_mix_sample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    target_shares: dict[str, float],
    salt: str = ":mix",
) -> DataFrame:
    """Resample a multi-domain corpus to target mixture proportions
    (the pretraining data-mixing step: e.g. upweight curated sources,
    downweight crawl).

    Semantics: output is the LARGEST corpus exactly matching
    ``target_shares`` without replication — n_out = min_d(count_d /
    share_d), each domain keeps floor(share_d * n_out) rows, and WHICH
    rows is decided by md5-hash order within the domain (deterministic
    and engine-portable for a given corpus). NOTE on growth: unlike the
    per-row hash_sample/hash_split family, quota-plus-rank selection is
    NOT append-stable — new rows interleave into the hash order and can
    displace previously-kept rows at the quota boundary. For a frozen
    training-set contract, pin the corpus snapshot (or record the kept
    doc_ids) rather than re-running the mix on a grown corpus.

    Plan: one small aggregate for domain counts — the isin filter on
    the share keys is pushed into the scan BEFORE the aggregate, so
    the collect is bounded by len(target_shares) regardless of how
    many domains the corpus actually has — then one window rank per
    domain and a broadcast-joined quota filter. The heavy table
    shuffles ONCE on the domain key; at 100 TB a skewed mega-domain
    would use the salted variant of the same rank (operators/skew.py
    pattern).
    """
    shares = {k: v / sum(target_shares.values()) for k, v in target_shares.items()}
    counts = {
        r[0]: r[1]
        for r in df.filter(F.col(domain_col).isin(list(shares)))
        .groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    missing = set(shares) - set(counts)
    if missing:
        raise ValueError(f"domains absent from data: {sorted(missing)}")
    n_out = min(counts[d] / s for d, s in shares.items() if s > 0)
    quotas = [(d, int(s * n_out)) for d, s in shares.items()]
    spark = df.sparkSession
    qdf = spark.createDataFrame(quotas, f"{domain_col} string, __quota long")

    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy(domain_col).orderBy(
            F.md5(
                F.encode(F.concat(F.col(id_col).cast("string"), F.lit(salt)), "UTF-8")
            ),
            id_col,
        )
    )
    ranked = df.join(F.broadcast(qdf), domain_col).withColumn("__rk", rk)
    return ranked.filter(F.col("__rk") <= F.col("__quota")).drop("__rk", "__quota")


def split_sql_case(id_expr: str, fractions: dict[str, float], salt: str = "") -> str:
    """The DuckDB-compatible SQL twin of hash_split's assignment expression
    (used by oracle queries; kept next to the Spark rule so the two can't
    drift)."""
    bucket = (
        f"CAST(('0x' || substr(md5(CAST({id_expr} AS VARCHAR) || '{salt}'), 1, 8)) "
        f"AS BIGINT) % {N_BUCKETS}"
    )
    parts = ["CASE"]
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        parts.append(f"WHEN {bucket} < {int(cum * N_BUCKETS)} THEN '{name}'")
    parts.append(f"ELSE '{names[-1]}' END")
    return " ".join(parts)
