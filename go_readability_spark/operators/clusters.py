"""Duplicate clustering: connected components over near-dup pairs.

After any pairwise dedup (exact groups already cluster; MinHash/SimHash/
Jaccard emit PAIRS), training pipelines need transitive clusters with one
canonical representative. This is min-label propagation over the pair
graph with a POINTER-JUMPING shortcut (label(v) <- label(label(v)) each
round), which makes convergence genuinely O(log(diameter)) — plain
neighbor-min alone moves labels ONE hop per round, i.e. O(diameter), and
a near-dup chain longer than the iteration cap would silently return
multiple cluster_ids for one component. With the shortcut, the default
cap of 10 rounds covers diameters beyond 2^10; if the cap is still hit,
the operator RAISES rather than returning wrong clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def duplicate_clusters(
    pairs: DataFrame, max_iterations: int = 10, checkpoint_every: int = 5
) -> DataFrame:
    """(id_a, id_b) pairs → (id, cluster_id) where cluster_id is the
    minimum member id of the connected component. Deterministic.

    Every `checkpoint_every` rounds the label table is localCheckpoint-ed:
    each iteration otherwise APPENDS a join+agg to the logical plan, and at
    large graph sizes the growing lineage dominates planning time and
    risks driver OOM on the plan tree itself (persist alone does not
    truncate lineage). The per-round `changed` count is a driver action by
    design — it is O(1) rows and is what terminates the loop early."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
    )
    # label(v) starts as min(v, min neighbor)
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("mn")).alias("label"),
        )
    ).persist()

    for it in range(max_iterations):
        if checkpoint_every and it > 0 and it % checkpoint_every == 0:
            ck = labels.localCheckpoint(eager=True)
            labels.unpersist()
            labels = ck
        # propagate: new_label(v) = min(label(v), min over neighbors of label(n))
        neighbor_labels = (
            edges.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
            .select(F.col("src").alias("id"), "nlabel")
        )
        stepped = labels.join(neighbor_labels, "id", "left").select(
            "id",
            F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"),
        )
        # pointer jumping: follow the label one more hop (label values are
        # themselves node ids, so they appear in `stepped`) — this is what
        # turns O(diameter) neighbor propagation into O(log diameter)
        parent = stepped.select(
            F.col("id").alias("label"), F.col("label").alias("plabel")
        )
        new_labels = (
            stepped.join(parent, "label", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("plabel"), F.col("label"))
                ).alias("label"),
            )
        ).persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iterations} rounds "
            "(component diameter > 2^rounds) — raise max_iterations; "
            "returning partial labels would silently split components"
        )

    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))
