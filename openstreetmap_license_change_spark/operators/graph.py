"""Distributed connected components by min-label propagation.

Shared graph machinery for every clustering operator in the engine:
spatial ε-clusters / DBSCAN (`operators/spatial.py`) and the sketch-
based near-dup clusterings (`operators/dedup.py`).  One algorithm,
one convergence contract, one non-convergence warning path.

Scale argument: min-label propagation with pointer jumping per round
(label ← label[label], the parallel union-find path-halving step)
converges in O(log diameter) rounds — plain edge-hop propagation
needs O(diameter) rounds, a 100-TB scale-killer on the chain-shaped
components real data produces (a road of ε-close points, a chain of
near-duplicate documents A~B~C).  Each round is two hash joins and a
groupBy — never a pairwise blow-up — and lineage is cut per round
(localCheckpoint, the staged cascade/LSH pattern) because labels
self-reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_label_components(
    ids: DataFrame, edges: DataFrame, max_iters: int, op_name: str
) -> DataFrame:
    """Connected components over an undirected edge list (``id_a``,
    ``id_b``) restricted to the vertex set ``ids`` (one column,
    ``id``): min-label propagation + pointer jumping per round (see
    module docstring for the convergence argument).
    Returns (id, label); isolated ids keep their own label."""
    import warnings as _warnings

    sym = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = ids.withColumn("label", F.col("id")).localCheckpoint(
        eager=True
    )
    changed = -1
    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nl"))
        )
        relaxed = labels.join(
            nbr_min, labels.id == nbr_min.src, "left"
        ).select(
            "id",
            F.least(
                F.col("label"), F.coalesce(F.col("nl"), F.col("label"))
            ).alias("label"),
        )
        # pointer jump: label ← label[label]; min-propagation keeps
        # every label a live point id, so the self-join always hits
        jumped = (
            relaxed.alias("a")
            .join(
                relaxed.select(
                    F.col("id").alias("_jid"), F.col("label").alias("_jl")
                ),
                F.col("a.label") == F.col("_jid"),
            )
            .select(F.col("a.id").alias("id"), F.col("_jl").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.alias("u")
            .join(labels.alias("l"), "id")
            .where(F.col("u.label") != F.col("l.label"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    else:
        msg = (
            f"{op_name}: propagation did NOT converge after "
            f"max_iters={max_iters} ({changed} labels still changing); "
            "cluster ids may split true components. Raise max_iters "
            "(rounds needed ~ log2 of the longest chain)."
        )
        _warnings.warn(msg, RuntimeWarning, stacklevel=3)
    return labels
