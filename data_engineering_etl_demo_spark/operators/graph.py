"""Connected components over an edge list — the clustering step of a
near-duplicate pipeline (pairs → clusters → one kept doc per cluster).

Reference parity note: the reference has no graph step (its dedup is
exact-key only, pipeline/transform.py:72-75); this generalizes its
"keep one representative per duplicate group" semantics to transitive
near-dup groups, per the north-star LLM-data operator set.

Algorithm: hash-min label propagation (BSP).  Every vertex starts
labeled with itself; each round every vertex adopts the minimum label
among itself and its neighbors; converged when no label changes.
Rounds needed = graph diameter, which for near-dup clusters is tiny
(dup clusters are dense cliques-ish, diameter 1-3).

Scale design (the point of doing this in Spark):
- State per round is one (node, label) row per vertex — shuffle keyed by
  node id, maximal cardinality, even partitions.  The edge list is
  re-joined each round, shuffled on the message key; nothing ever
  materializes O(n²).
- Iterative self-joins grow the logical plan exponentially in Catalyst
  analysis time if lineage is never cut: `localCheckpoint(eager=True)`
  truncates the plan each round (on a real cluster with an HDFS/S3
  checkpoint dir, `checkpoint()` is the fault-tolerant variant; the
  algorithm is identical).
- Convergence is detected with a `changed == 0` count on the round's
  delta — one cheap action per round on already-materialized state.
- For adversarial high-diameter graphs, the known fix is the
  large-star/small-star rewiring of Kiveris et al.; not needed for
  near-dup clusters, so we keep the simpler hash-min with a max_iter
  guard (raising if exceeded rather than silently returning a
  half-converged labeling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every vertex that appears in `edges`;
    component = minimum node id reachable through the undirected graph.
    Deterministic (min over ids), so the result is engine-comparable."""
    # Materialize the incoming edge plan once: the symmetric union below
    # references it twice, and the upstream plan may be expensive (e.g. the
    # full MinHash pair pipeline) — without this, it executes twice.
    ed = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=True
    )
    sym = (
        ed.union(ed.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Observation

    for _ in range(max_iter):
        # min neighbor label per vertex, folded with the vertex's own label
        msgs = sym.join(
            labels.withColumnRenamed("node", "b"), on="b"
        ).select(F.col("a").alias("node"), "component")
        folded = (
            labels.union(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # Convergence detection rides the SAME action that materializes the
        # round's labels: join the previous labels back in and observe the
        # changed-count, so each round is ONE job instead of two (the
        # join is node ⋈ node over two already-materialized tiny frames).
        obs = Observation()
        new_labels = (
            folded.join(
                labels.select(
                    "node", F.col("component").alias("_prev")
                ),
                on="node",
            )
            .observe(
                obs,
                F.sum(
                    F.when(F.col("component") != F.col("_prev"), 1).otherwise(0)
                ).alias("changed"),
            )
            .select("node", "component")
            .localCheckpoint(eager=True)
        )
        labels = new_labels
        if int(obs.get["changed"] or 0) == 0:
            return labels
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
