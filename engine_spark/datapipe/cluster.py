"""Connected-components clustering over a near-duplicate pair graph.

The canonical dedup flow at corpus scale is: LSH candidate pairs → verified
near-dup edges → **connected components** → keep one canonical document per
component. Pair lists alone under-delete (A≈B, B≈C but A,C were never a
candidate pair — all three are one duplicate cluster); components close the
transitive hull. The reference engine has no dedup surface at all — this is
part of the brief-mandated LLM-data-pipeline module, built Spark-first.

Algorithm: iterative min-label propagation (a.k.a. hash-to-min). Every node
starts labeled with itself; each round every node takes the minimum label
among itself and its neighbors; fixpoint ⇔ every node carries the minimum
doc_id of its component.

Scale design (the part that must survive 100 TB):
- one round = ONE shuffle-join (edges ⋈ labels on the neighbor key) + ONE
  combine-enabled min-aggregation — both keyed shuffles, no driver data;
- rounds needed = max component *diameter* (log₂ of it with the pointer
  jump below). Near-dup components are clique-like (every member shares
  most shingles with every other, so LSH emits most pairs directly) —
  diameter 2-3 in practice, so 3-4 rounds.
- adversarially chain-shaped graphs that haven't converged after
  ``star_after`` rounds fall back to the alternating large-star /
  small-star edge-rewiring formulation (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC 2014) — implemented below in
  :func:`star_components` — which contracts ANY graph to a forest of
  min-rooted stars in O(log² n) rounds of keyed groupBy+join work, no
  label state, no driver data;
- per-round ``localCheckpoint`` truncates the growing lineage so round k
  doesn't re-execute rounds 1..k-1 (the classic iterative-Spark trap);
- the driver sees only a one-row changed-count per round, never data.

The convergence check and the label update share one cached plan, so each
round costs exactly two jobs (materialize + count), both O(|V|/cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
    star_after: int = 8,
) -> DataFrame:
    """Labels every vertex of the undirected graph ``edges`` with the
    minimum vertex id of its connected component.

    Returns ``(vertex, component)`` — one row per distinct vertex that
    appears in any edge. Min-label propagation with pointer jumping is
    the fast path (clique-like near-dup graphs converge in 3-4 rounds);
    a graph still unconverged after ``star_after`` rounds — effective
    diameter > 2^star_after, i.e. adversarially chain-shaped — switches
    to :func:`star_components`, which converges on ANY graph.
    """
    # materialize the edge list ONCE before symmetrizing: the union below
    # references it twice, and recomputing an expensive upstream (e.g. the
    # whole MinHash-LSH candidate pipeline) per branch doubles its cost
    base = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(
        eager=True
    )
    sym = base.union(
        base.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select("u").distinct().withColumn("lbl", F.col("u"))
    ).localCheckpoint(eager=True)

    for rnd in range(min(max_rounds, star_after)):
        neighbor_lbl = sym.join(
            labels.withColumnsRenamed({"u": "v", "lbl": "nlbl"}), "v"
        ).select("u", F.col("nlbl").alias("lbl"))
        stage = (
            labels.union(neighbor_lbl)
            .groupBy("u")
            .agg(F.min("lbl").alias("lbl"))
        )
        # pointer jump: lbl ← min(lbl, lbl[lbl]). Following the label one
        # extra hop per round turns O(diameter) convergence into
        # O(log diameter) on chain-shaped components for the price of one
        # more keyed join — the same doubling trick as large-star
        # (Kiveris et al. 2014) without rewiring edges.
        ptr = stage.select(F.col("u").alias("_p"), F.col("lbl").alias("_plbl"))
        jumped = stage.join(ptr, stage["lbl"] == ptr["_p"], "left").select(
            "u",
            F.least(
                F.col("lbl"), F.coalesce(F.col("_plbl"), F.col("lbl"))
            ).alias("lbl"),
        )
        if rnd == 0:
            # every component has ≥2 vertices (vertices come from edges),
            # so round 1 always relabels the non-min members — skip the
            # convergence check entirely
            labels = jumped.localCheckpoint(eager=True)
            continue
        # fuse the convergence flag INTO the round's one materialization:
        # the old-label join runs inside the same checkpoint job, and the
        # changed-count is then a cheap scan of checkpointed partitions
        # instead of a second join job per round
        prev = labels.select("u", F.col("lbl").alias("_old"))
        new_labels = (
            jumped.join(prev, "u")
            .withColumn("_chg", F.col("lbl") != F.col("_old"))
            .drop("_old")
        ).localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("_chg")).limit(1).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            return labels.select(
                F.col("u").alias("vertex"), F.col("lbl").alias("component")
            )
    # effective diameter > 2^star_after: an adversarially chain-shaped
    # graph. Hand the ORIGINAL symmetric edge set to the star-contraction
    # formulation (labels accumulated so far are discarded — star rounds
    # work on edges, not labels, and converge on any graph shape).
    return star_components(sym)


def star_components(sym: DataFrame, max_rounds: int = 64) -> DataFrame:
    """Connected components by alternating large-star / small-star edge
    rewiring (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014) — the shape-proof path for graphs whose diameter
    defeats label propagation (million-link chains, adversarial near-dup
    corpora).

    ``sym`` is a SYMMETRIC self-loop-free edge list with columns (u, v).
    Each round is two passes of one groupBy-min + one keyed join each —
    no label state, no collect:

    - large-star: every center a attaches each LARGER neighbor b > a to
      m(a) = min(N(a) ∪ {a}) — each undirected edge {a,b} is processed
      exactly once, from its smaller endpoint;
    - small-star: every center a attaches each neighbor b < a, and a
      itself, to m(a) = min of that small-neighborhood.

    The paper proves the alternation monotonically contracts to a forest
    of stars whose roots are the component minima in O(log² n) rounds;
    convergence here = the directed child→root edge set is unchanged by
    a full round (two exceptAll probes on the shrinking set). Returns
    ``(vertex, component)`` like :func:`connected_components`.
    """
    edges = sym.filter(F.col("u") != F.col("v")).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        adj = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
        mins = (
            adj.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", "u").alias("m"))
        )
        large = (
            adj.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        adj2 = large.union(
            large.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
        nle = adj2.filter(F.col("v") < F.col("u"))
        mins2 = nle.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            nle.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins2.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        stable = (
            small.exceptAll(edges).limit(1).count() == 0
            and edges.exceptAll(small).limit(1).count() == 0
        )
        edges = small
        if stable:
            break
    else:
        raise RuntimeError(
            f"star_components: no fixpoint after {max_rounds} rounds "
            "(O(log² n) bound exceeded — malformed input?)"
        )
    # fixpoint: every edge is (child, root) with root = component min
    leaves = edges.select(
        F.col("u").alias("vertex"), F.col("v").alias("component")
    )
    roots = (
        edges.select(F.col("v").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    )
    return leaves.union(roots)


def dedup_clusters(
    pairs: DataFrame,
    left: str = "doc_a",
    right: str = "doc_b",
) -> DataFrame:
    """Near-dup pair list → per-document cluster assignment.

    Output: ``(doc_id, canonical_id, cluster_size, is_canonical)`` for every
    document that appears in at least one verified near-dup pair. The
    canonical document of a cluster is its minimum doc_id (deterministic,
    engine-independent); downstream dedup keeps rows where
    ``is_canonical`` and drops the rest.
    """
    comp = connected_components(pairs, src=left, dst=right)
    sizes = comp.groupBy("component").agg(
        F.count("*").alias("cluster_size")
    )
    return (
        comp.join(sizes, "component")
        .select(
            F.col("vertex").alias("doc_id"),
            F.col("component").alias("canonical_id"),
            "cluster_size",
            (F.col("vertex") == F.col("component")).alias("is_canonical"),
        )
    )
