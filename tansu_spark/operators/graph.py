"""Connected components over an edge DataFrame — the clustering stage of a
dedup pipeline: near-dup PAIRS (MinHash/SimHash/cosine) -> duplicate
CLUSTERS -> one canonical survivor per cluster. Reference parity: the
reference's compaction keeps one record per key (tansu: storage/src/lib.rs
compaction path); this generalizes "one survivor per equivalence class" to
similarity graphs, which its engine cannot express.

Algorithm: iterative hash-min label propagation. Every node starts
labelled with itself; each round every node takes the min label over
itself and its neighbors; fixpoint = components labelled by their min
member (a deterministic canonical id — no RNG, no partition dependence).

Scale design:
- Each round is ONE shuffle: a join of the (symmetrized) edge list with
  the current labels on the source id, then a min-groupBy on the
  destination id. Both shuffles hash on node ids — uniform, skew-safe
  unless one node has pathological degree (LSH bucket caps upstream
  bound that).
- Rounds are bounded by graph DIAMETER. Near-dup graphs are LSH-band
  cliques stitched by verification — diameter is almost always <= 3-4,
  so 3-5 rounds at any data size. For general graphs with long chains,
  alternate large-star/small-star (Kiveris et al. 2014, "Connected
  Components in MapReduce and Beyond") — same DataFrame primitives,
  O(log^2 n) rounds; not needed for dedup topology.
- `localCheckpoint(eager=True)` truncates lineage each round so the plan
  does not grow with iterations (Catalyst re-optimizes a constant-size
  plan; without it round k replays rounds 1..k-1).
- Convergence is detected with a count of strictly-decreased labels
  (labels are monotone non-increasing, so "changed" == "decreased").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_out: str = "node",
    comp_out: str = "component_id",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component_id) for every node appearing in `edges`, where
    component_id is the minimum node id in the component. Deterministic;
    isolated nodes (absent from edges) are not emitted — union them in
    as self-components if needed."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = e.distinct().localCheckpoint(eager=True)

    # Round 1 fused into initialization: each node's label starts at the
    # min over its closed neighborhood (the same groupBy that would have
    # extracted the node set).
    labels = (
        e.groupBy("a")
        .agg(F.least(F.min("b"), F.col("a")).alias("comp"))
        .select(F.col("a").alias("node"), "comp")
        .localCheckpoint(eager=True)
    )
    comp_type = labels.schema["comp"].dataType

    for _ in range(max_iter):
        # Labels flow across every edge a->b; each node keeps the min of
        # what arrives plus its own current label. The old label travels
        # through the same union (tagged via `old`), so convergence needs
        # no compare-join afterwards — just a scan of the materialized
        # result.
        msgs = e.join(labels, e["a"] == labels["node"]).select(
            F.col("b").alias("node"),
            F.col("comp"),
            F.lit(None).cast(comp_type).alias("old"),
        )
        new_labels = (
            msgs.unionByName(labels.select("node", "comp", F.col("comp").alias("old")))
            .groupBy("node")
            .agg(F.min("comp").alias("comp"), F.min("old").alias("old"))
            .localCheckpoint(eager=True)
        )
        n_changed = new_labels.filter(F.col("comp") < F.col("old")).count()
        labels = new_labels.select("node", "comp")
        if n_changed == 0:
            break

    return labels.select(F.col("node").alias(node_out), F.col("comp").alias(comp_out))
