"""Duplicate-cluster resolution: connected components over candidate
pairs.

Near-dup detection (dedup.py / the portable-oracle pipelines) emits
PAIRS; a training-data run needs CLUSTERS — "keep one document per
group of mutual near-duplicates", where duplicate chains (a~b, b~c,
a!~c) must still collapse to one survivor. That is connected
components over the pair graph, computed here as iterative min-label
propagation in pure DataFrame ops:

- every node starts labeled with itself;
- each round, a node takes the minimum label among itself and its
  neighbors' labels (one join + one groupBy per round);
- iterate to fixpoint: converged when no label changed.

Rounds needed = graph diameter; duplicate clusters are shallow (near-
dup groups, not social graphs), so the loop is short in practice and
``max_iters`` bounds it. Each round materializes via localCheckpoint —
iterative lineage would otherwise stack and re-execute (and the
CacheManager stays out of later queries' plans). The per-round
convergence check is one count aggregate, not a collect of labels.

At 100 TB scale the same loop shape holds: the label frontier shuffles
on node id each round, and adversarial diameters are covered by the
default pointer-jumping step (each round additionally replaces a
node's label with its label's label, TWICE — quartering the remaining
chain length per round; O(log diameter) rounds total instead of
O(diameter), the classic Shiloach-Vishkin shortcut as used by the
MapReduce CC literature). Two extra in-round self-joins trade against
whole driver-sequenced rounds, each of which costs a checkpoint job
plus a convergence-count job; duplicate-cluster graphs converge in
2-3 rounds either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(pairs: DataFrame, a_col: str = "id_a",
                         b_col: str = "id_b", max_iters: int = 20,
                         pointer_jump: bool = True,
                         pairs_canonical: bool = False) -> DataFrame:
    """(node, label) for every node appearing in ``pairs``; ``label``
    is the minimum node id reachable from ``node`` (deterministic
    canonical representative).

    ``pointer_jump=True`` (default) adds a label-chain contraction each
    round: sound because ``label(n) <= n`` is invariant (min always
    includes self), so ``label(label(n))`` is a reachable, no-larger
    representative for ``n``.

    ``pairs_canonical=True`` declares the input already DISTINCT with
    ``a_col < b_col`` on every row (the near-dup pair pipelines end in
    exactly that shape). The undirected edge list is then duplicate-free
    by construction — the two union legs cannot overlap (one has
    src<dst, the other src>dst) and each leg inherits the input's
    distinctness — so the edge-dedup exchange+aggregate is skipped.
    Duplicate edges would only cost work, never correctness (min-label
    propagation is idempotent over repeated edges), so the flag is a
    pure shuffle-removal knob (guide §2.4)."""
    und = (pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
           .union(pairs.select(F.col(b_col).alias("src"),
                               F.col(a_col).alias("dst"))))
    if not pairs_canonical:
        und = und.distinct()
    und = und.localCheckpoint(eager=True)
    labels = (und.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint(eager=True))
    for _ in range(max_iters):
        nbr = (und.join(labels, und.dst == labels.node)
               .select(F.col("src").alias("node"),
                       F.col("label").alias("nbr_label")))
        # labels is unique per node, so min("label") IS the old label —
        # carrying it through the agg lets the convergence check below
        # run as a plain scan of the checkpointed result instead of a
        # second shuffle join against the previous round
        new = (labels.join(nbr, "node", "left")
               .groupBy("node")
               .agg(F.min("label").alias("old_label"),
                    F.least(F.min("label"), F.min("nbr_label"))
                    .alias("label")))
        if pointer_jump:
            # label-chain contraction, applied TWICE per checkpointed
            # round: node takes its label's label, then that label's
            # label (always present — every label is itself a node).
            # Each application halves the remaining chain length, so two
            # contractions quarter it; the extra self-join runs inside
            # the SAME driver round, trading a cheap in-round join for
            # whole driver-sequenced rounds (each round costs a
            # localCheckpoint job + a convergence-count job — the
            # dominant fixed cost of the loop at any scale).
            for _ in range(2):
                parent = new.select(F.col("node").alias("p_node"),
                                    F.col("label").alias("p_label"))
                new = (new.join(parent, new.label == parent.p_node,
                                "left")
                       .select(F.col("node"), F.col("old_label"),
                               F.least(F.col("label"),
                                       F.coalesce(F.col("p_label"),
                                                  F.col("label")))
                               .alias("label")))
        new = new.localCheckpoint(eager=True)
        changed = (new.filter(F.col("label") != F.col("old_label"))
                   .count())
        labels = new.select("node", "label")
        if changed == 0:
            break
    return labels


def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id",
                   pairs_canonical: bool = False) -> DataFrame:
    """Collapse near-duplicate clusters to one canonical survivor per
    component (minimum id wins; documents in no pair survive as their
    own singleton). Returns ``docs`` filtered to the survivors.
    ``pairs_canonical`` — see ``connected_components``."""
    comp = connected_components(pairs, pairs_canonical=pairs_canonical)
    losers = (comp.filter(F.col("node") != F.col("label"))
              .select(F.col("node").alias(id_col)))
    return docs.join(losers, id_col, "left_anti")
