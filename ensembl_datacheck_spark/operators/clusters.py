"""Duplicate-cluster resolution: connected components over a near-dup
pair graph, then canonical-representative selection.

The dedup operators (dedup.py / similarity.py) emit candidate PAIRS;
training-data dedup needs CLUSTERS ("keep one doc per group of mutual
near-dups").  Connected components are computed as **min-label
propagation with pointer doubling**: each round every node takes the
min label over its neighborhood (two shuffle-keyed aggregations), then
chases one label indirection (label ← min(label, label-of-label), one
equi-join) — the path-doubling step that turns the naive O(diameter)
convergence into O(log diameter), so a templated-document chain of
length 200 converges in ~8 rounds instead of hitting the cap.  An
explicit iteration cap plus a convergence check via a count aggregate
bound the loop.

No driver-side graph materialization: labels live in a DataFrame keyed
by node; at 10^12-doc scale the pair graph is sparse (near-dups are
rare) so each iteration shuffles only the affected nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """(node, component) labels from an undirected edge list; component =
    min node id in the component.

    Algorithm: min-label propagation **with pointer doubling** — every
    node starts as its own label; each round a node adopts the min label
    in its neighborhood (including itself), then chases one indirection:
    label ← min(label, label-of-label).  A label is always a node id
    that itself carries a label (labels only ever move DOWN to ids seen
    in the graph), so the chase is a plain equi-join of the label table
    against itself.  Propagation alone converges in O(diameter) rounds —
    a 200-link boilerplate-ladder chain would blow any practical cap;
    with doubling the label horizon doubles per round, giving
    O(log diameter) (~8 rounds for that chain).  Near-dup graphs are
    overwhelmingly tiny cliques (diameter 1-2, converge in 2) plus the
    occasional such chain, which ``max_iterations=50`` now covers with
    orders of magnitude to spare.  If the cap is still hit a
    RuntimeWarning is emitted — labels are then an over-segmentation
    (clusters split, never wrongly merged).  localCheckpoint cuts the
    growing lineage each round (iterative plans otherwise re-execute
    from the source).

    ``stats`` (optional dict) receives ``{"rounds": <n>, "converged":
    <bool>}`` — a pointer-doubling regression (the r3 bug class) shows
    up as rounds blowing past ~log2(diameter)+2 long before walls do,
    so benches pin the round count, not just the wall.
    """
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # undirected: both directions
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for i in range(max_iterations):
        # neighbor labels: for each node, min(label of neighbors)
        neigh = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(sym["a"].alias("node"))
            .agg(F.min("component").alias("neigh_min"))
        )
        propagated = (
            labels.join(neigh, "node", "left_outer")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("neigh_min", F.col("component"))
                ).alias("component"),
            )
        )
        # pointer doubling: label ← min(label, label-of-label).  The
        # lookup side is unique per node, so the join cannot fan out; a
        # mega-cluster's hot label lands on one reducer bounded by the
        # cluster's member count (same bound as the neighbor join).
        hop = propagated.select(
            F.col("node").alias("component"), F.col("component").alias("grand")
        )
        new_labels = propagated.join(hop, "component", "left_outer").select(
            "node",
            F.least(
                F.col("component"), F.coalesce("grand", F.col("component"))
            ).alias("component"),
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            if stats is not None:
                stats.update(rounds=i + 1, converged=True)
            break
    else:
        import warnings

        if stats is not None:
            stats.update(rounds=max_iterations, converged=False)
        warnings.warn(
            f"connected_components did not converge in {max_iterations} "
            "iterations (graph diameter exceeds the cap); labels are an "
            "over-segmentation",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_members: int = 20,
) -> DataFrame:
    """(component, size, member_ids[:max_members]) for every multi-member
    cluster.  The member list is rank-capped BEFORE the aggregation
    (window ``row_number() <= max_members`` over the component, lowest
    node ids win) so a mega-cluster — the common degenerate case at
    corpus scale — never materializes all its members in one
    ``collect_list`` buffer; the spillable sort-based window takes that
    load instead, and the groupBy reuses the window's hash partitioning
    (one shuffle total).  Output identical to the uncapped-buffer
    formulation."""
    labels = connected_components(pairs, id_a, id_b)
    w = Window.partitionBy("component").orderBy("node")
    return (
        labels.withColumn("__rn", F.row_number().over(w))
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("size"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("__rn") <= max_members, F.col("node"))
                )
            ).alias("members"),
        )
        .filter(F.col("size") > 1)
    )


def dedup_keep_canonical(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Drop every cluster member except the canonical (min id) — the
    end-to-end dedup: candidates → clusters → filtered corpus.  Rows not
    in any cluster pass through untouched (left join, no fan-out)."""
    labels = connected_components(pairs, id_a, id_b)
    drop = labels.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")
