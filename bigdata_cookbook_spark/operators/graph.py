"""Graph-building operators (SURVEY.md §1.1-7, J8, Election bipartite).

Outputs are plain edge DataFrames — the reference needs no graph
algorithms beyond degree/aggregation (network layout is visualization-only,
network_analysis.py:206), so no GraphFrames dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_cookbook_spark.operators.analytics import mode_per_group


def co_mention_pairs(
    labeled: DataFrame,
    left_label: str = "P",
    right_labels: tuple[str, ...] = ("A", "N"),
    max_texts: int = 5,
) -> DataFrame:
    """J8: provider×user co-mention edges within a chunk (reference
    network_analysis.py:129-201).

    Self-join on sentence_id restricted by role; edge weight = co-mention
    count, payload = collected sample texts. The join key (sentence_id)
    is high-cardinality so the shuffle partitions evenly; role filters
    shrink both sides before the join.
    """
    base = labeled.select("sentence_id", "entity_id", "entity_name", "label", "text")
    a = base.filter(F.col("label") == left_label).alias("a")
    b = base.filter(F.col("label").isin(*right_labels)).alias("b")
    pairs = a.join(
        b,
        (F.col("a.sentence_id") == F.col("b.sentence_id"))
        & (F.col("a.entity_id") != F.col("b.entity_id")),
    )
    return (
        pairs.groupBy(
            F.col("a.entity_id").alias("src_id"),
            F.col("a.entity_name").alias("src_name"),
            F.col("b.entity_id").alias("dst_id"),
            F.col("b.entity_name").alias("dst_name"),
        )
        .agg(
            F.count(F.lit(1)).alias("weight"),
            F.slice(F.sort_array(F.collect_set(F.col("a.text"))), 1, max_texts).alias(
                "sample_texts"
            ),
        )
    )


def cooccurrence_pairs(
    facts: DataFrame,
    group_col: str,
    item_col: str,
    min_weight: int = 2,
    pre_partitioned: bool = False,
    width: int | None = None,
    pack: bool = True,
) -> DataFrame:
    """J8 kernel: item pairs co-occurring within a group, edge weight =
    co-occurrence count (reference network_analysis.py:129-201; the
    q_comention_parts registry query is this over lineitem).

    groupBy(group) -> in-array pair expansion instead of a self-join: one
    shuffle of the compact fact rows (keyed by the high-cardinality
    group col even at scale), pairs expand inside each group (bounded by
    per-group cardinality), then one shuffle of the pairs. Measured
    alternatives (round 2/3, sf0.1): sort-merge self-join ~2x slower;
    sorted-bucket self-join 0.93s vs 0.56s; mapInPandas 1.3s vs 0.6s.

    Round-4 exhaustion of the kernel space (sf0.1, pre-partitioned
    input, min-of-4 each, rows verified identical): this HOF expansion
    0.527s; positional double-explode via posexplode+slice (codegen'd
    Generates, no interpreted lambdas) 0.478-0.531s; SHUFFLE_HASH
    self-join 0.615s — every formulation lands within noise of ~0.5s.
    Stage decomposition shows why: groupBy+collect_list 0.143s, + pair
    expansion (1.2M pairs) 0.162s, + pair aggregate 0.565s — i.e. ~0.4s
    (75%) is the pair-key Exchange plus the ~1.2M-distinct-key hash
    aggregate, identical in every variant (partial aggregation merges
    almost nothing: duplicate pairs are spread across partitions, so
    the map side cannot shrink the shuffle). The same-box DuckDB warm
    number is 0.069s (empty two-stage Spark job floor: 0.026s). The gap
    is therefore the per-row cost of Spark's general two-stage
    distributed aggregate on a dataset DuckDB fuses into one in-memory
    radix-agg pipeline — an engine constant factor at single-node toy
    scale, not a removable plan property: the plan itself (expand in
    place, aggregate partitioned by pair key) is the one that scales
    out, with no single-node structure anywhere.

    ``pre_partitioned=True`` declares the input already hash-distributed
    on ``group_col`` (a bucketed table from plans/layout.write_bucketed,
    or an upstream repartition) — the group shuffle disappears and the
    whole query runs with ONE Exchange (the pair aggregate). That is the
    100 TB layout: the co-occurrence fact table stored bucketed on its
    group key. Measured at sf0.1: 0.56s bucketed vs 0.76s plain.

    With ``pack=True`` (default) pairs pack into one long (a<<32 | b,
    strict a<b ordering) so the pair shuffle rows and aggregate hash keys
    are a single fixed-width column, decoded only after the HAVING filter
    has shrunk the result. That requires both item ids <= 2^31-1 (the
    smaller id is multiplied by 2^32, so ids >= 2^31 overflow the signed
    64-bit product into a negative key that decodes wrongly; TPC-H part
    keys stay under 2^31 through ~SF10k); beyond it — or for non-integer
    items — ``pack=False`` shuffles the pair as a two-column key:
    identical semantics and plan shape, a fatter shuffle row (tested
    row-identical).
    """
    src = facts.select(group_col, item_col)
    if not pre_partitioned:
        w = width or facts.sparkSession.sparkContext.defaultParallelism
        src = src.repartition(w, group_col)
    grouped = src.groupBy(group_col).agg(F.collect_list(item_col).alias("ps"))
    if pack:
        packed = grouped.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ps",
                        lambda x: F.transform(
                            F.filter("ps", lambda y: y > x),
                            lambda y: x * F.lit(1 << 32) + y,
                        ),
                    )
                )
            ).alias("pk")
        )
        agg = (
            packed.groupBy("pk")
            .agg(F.count(F.lit(1)).alias("weight"))
            .filter(F.col("weight") >= min_weight)
        )
        return agg.select(
            F.shiftright("pk", 32).alias("part_a"),
            (F.col("pk") % F.lit(1 << 32)).alias("part_b"),
            "weight",
        )
    pairs = grouped.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ps",
                    lambda x: F.transform(
                        F.filter("ps", lambda y: y > x),
                        lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("weight"))
        .filter(F.col("weight") >= min_weight)
    )


def company_topic_bipartite(
    screening: DataFrame,
    labeled_col: str = "label",
    blacklist: tuple[str, ...] = (),
) -> DataFrame:
    """Election bipartite company-topic edges (visualization_tools.py:
    573-695): explode topics, drop COMP-typed and blacklisted ones, count
    co-occurrences and attach the majority label per (company, topic)."""
    ex = screening.select(
        "entity_id",
        "entity_name",
        labeled_col,
        F.explode(F.arrays_zip("topics", "topics_type")).alias("t"),
    ).select(
        "entity_id",
        "entity_name",
        labeled_col,
        F.col("t.topics").alias("topic"),
        F.col("t.topics_type").alias("topic_type"),
    )
    filtered = ex.filter(F.col("topic_type") != "COMP")
    if blacklist:
        filtered = filtered.filter(~F.col("topic").isin(*blacklist))
    counts = filtered.groupBy("entity_id", "entity_name", "topic").agg(
        F.count(F.lit(1)).alias("weight")
    )
    majority = mode_per_group(
        filtered, ["entity_id", "topic"], labeled_col, out_col="majority_label"
    )
    return counts.join(majority, ["entity_id", "topic"], "left")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Min-label propagation connected components over an edge list.

    Returns (node, component) with component = the smallest node id in
    the node's component. Each round: (1) every node takes the min of
    its own label and its neighbors' labels — one groupBy shuffle on
    node id; (2) a pointer-jump step label <- label(label) — one
    self-join on the label table, the Shiloach-Vishkin/hash-to-min
    shortcutting move. Without step 2 convergence is O(diameter), and
    the round-4 sf1 rehearsal hit exactly that wall: the planted
    prefix-clone chains in the near-dup candidate graph formed a
    component of diameter > 20 and the propagation-only loop blew its
    max_iter. With jumping, the distance a label still has to travel
    compresses roughly geometrically, so convergence is O(log
    diameter): a 1200-node chain converges in 11 rounds (measured;
    propagation-only needs 1200), and max_iter=20 covers diameters
    beyond any physical graph (~2^20). Fixpoint is exact: labels stable under step 1+2 ==
    every edge's endpoints share a label == correct components (pinned
    against the recursive-CTE oracle by q_neardup_canonical_clusters).
    Lineage is cut with localCheckpoint per round so the plan stays
    flat. The alternating large-star/small-star formulation (Kiveris et
    al., "Connected Components in MapReduce and Beyond") remains the
    escape hatch if a workload ever needs provable O(log^2 n) on
    adversarial topologies.
    """
    # Pin the edge list ONCE before the loop: every round's neighbor
    # join references it, and without the checkpoint the whole upstream
    # candidate-generation DAG (e.g. the MinHash banding self-join) is
    # lazily RE-EXECUTED per round — the same plan multiplication the
    # round-10 corpus_clean LSH fix closed. Checkpointing the deduped
    # directed list (half the symmetrized size) cut the sf1
    # cluster_safe_split end-to-end fixpoint 117 s -> measured in
    # OPTIMIZATION_r11.md; the loop's own labels checkpoint below was
    # already doing this for the label lineage.
    cand = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .localCheckpoint()
    )
    sym = cand.union(cand.select(F.col("b").alias("a"), F.col("a").alias("b")))
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("component")).localCheckpoint()
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        propagated = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.col("component").alias("__old"),
            F.least("component", F.coalesce("nbr_min", "component")).alias(
                "component"
            ),
        )
        # pointer jump: component <- label(component). The label table
        # maps every node (labels cover all nodes, and a component value
        # is always some node's id), so the lookup never misses; the
        # coalesce only guards the root's self-reference shape.
        lookup = propagated.select(
            F.col("node").alias("__c"), F.col("component").alias("__cc")
        )
        new_labels = (
            propagated.join(lookup, propagated.component == F.col("__c"), "left")
            .select(
                "node",
                F.least(
                    "component", F.coalesce("__cc", "component")
                ).alias("component"),
                (
                    F.least("component", F.coalesce("__cc", "component"))
                    < F.col("__old")
                ).alias("__changed"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("__changed")).limit(1).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(diameter beyond ~2^{max_iter}); raise max_iter or switch to "
        "the large-star/small-star formulation"
    )


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "doc_id",
    pair_cols: tuple[str, str] = ("doc_a", "doc_b"),
) -> DataFrame:
    """Candidate near-dup pairs -> canonical assignment per document.

    The missing last step of the LSH/Jaccard dedup tier: pairs only say
    "a duplicates b"; transitive groups need connected components, and
    the canonical representative is each component's min id (stable,
    deterministic). Documents with no dup edge map to themselves.
    Output: (id_col, canonical_id, is_canonical).
    """
    comp = connected_components(pairs, src=pair_cols[0], dst=pair_cols[1])
    out = all_ids.select(id_col).join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    )
    return out.select(
        id_col,
        F.coalesce("component", F.col(id_col)).alias("canonical_id"),
    ).withColumn("is_canonical", F.col(id_col) == F.col("canonical_id"))


def dedup_keep_best(
    pairs: DataFrame,
    docs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    pair_cols: tuple[str, str] = ("doc_a", "doc_b"),
) -> DataFrame:
    """Quality-aware canonical selection: candidate near-dup pairs ->
    transitive clusters -> keep the HIGHEST-SCORING member per cluster
    (ties broken by min id), not the min-id member.

    dedup_clusters' min-id rule is stable but quality-blind: in a
    near-dup cluster of a full article and its truncated syndication
    copies, min-id keeps whichever was crawled first. Real pipelines
    keep the best copy — longest, highest quality score, least
    boilerplate — and drop the rest. Same component machinery
    (pointer-jumped min-label propagation, O(log diameter)); the argmax
    runs per component, and components are near-dup cliques (tiny), so
    the extra window shuffles only the clustered subset, never the
    whole corpus.

    Output: (id_col, canonical_id, is_canonical) — the same shape as
    dedup_clusters, with canonical_id = the best-scoring member's id.
    Singleton documents (no dup edge) are their own canonical.
    """
    from pyspark.sql import Window

    comp = connected_components(pairs, src=pair_cols[0], dst=pair_cols[1])
    scored = comp.join(
        docs.select(F.col(id_col).alias("node"), F.col(score_col).alias("__s")),
        "node",
    )
    w = Window.partitionBy("component").orderBy(
        F.col("__s").desc(), F.col("node").asc()
    )
    best = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("component", F.col("node").alias("__best"))
    )
    out = (
        docs.select(id_col)
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .join(best, "component", "left")
    )
    return out.select(
        id_col,
        F.coalesce("__best", F.col(id_col)).alias("canonical_id"),
    ).withColumn("is_canonical", F.col(id_col) == F.col("canonical_id"))
