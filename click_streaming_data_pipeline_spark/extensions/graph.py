"""Clickstream graph analytics (beyond-reference extension): the
page-transition graph (which doc a user views next — the Markov chain
of attention) and PageRank over it.

PageRank is the repo's second iterative-graph representative next to
``dedup.neardup_clusters`` (connected components): driver-loop over
DataFrame jobs, one join + one aggregation per iteration, state
checkpointed between rounds so lineage stays flat.

Determinism: per-iteration contribution sums accumulate in
decimal(38,18) — integer-exact addition, order-independent — so ranks
are bit-stable across runs/partitionings even though groupBy order is
not. The dangling-mass simplification (nodes with no out-edges leak
their rank; totals sum to < 1) is the standard simplified variant and
is mirrored exactly by the pytest's pure-python oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DAMPING = 0.85
N_ITER = 10


def transition_edges(events: DataFrame) -> DataFrame:
    """(src, dst, n_transitions): consecutive doc views per user
    (ordered by ts, event_id), self-loops dropped. One window pass on
    user_id + one grouped count — both on bounded key spaces."""
    key = F.get_json_object("props", "$.k").cast("int")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select("user_id", "ts", "event_id", key.alias("dst"))
        .withColumn("src", F.lag("dst").over(w))
        .filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
    )
    return pairs.groupBy("src", "dst").agg(
        F.count("*").alias("n_transitions")
    )


def pagerank(
    edges: DataFrame,
    *,
    n_iter: int = N_ITER,
    damping: float = DAMPING,
) -> DataFrame:
    """Weighted PageRank over (src, dst, n_transitions) edges.

    Each iteration: contributions = rank * w/out_w per edge (one
    broadcast-ready join on src), summed per dst in decimal (exact,
    order-free), then rank = (1-d)/N + d * in_sum. Edge weights use
    the transition counts, so a page visited twice from A counts
    double — the Markov-chain walk. State (node, rank) checkpoints
    every round; at warehouse scale node state is a table, edges
    shuffle once per iteration on src — the classic Pregel-on-
    DataFrames shape.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_w = edges.groupBy("src").agg(
        F.sum("n_transitions").alias("out_w")
    )
    # edge share = w/out_w, fixed across iterations — materialize once
    shares = (
        edges.join(out_w, "src")
        .select(
            "src",
            "dst",
            (F.col("n_transitions").cast("double") / F.col("out_w")).alias(
                "share"
            ),
        )
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        contrib = shares.join(
            ranks, shares.src == ranks.node
        ).select(
            F.col("dst"),
            (F.col("rank") * F.col("share"))
            .cast("decimal(38,18)")
            .alias("c"),
        )
        sums = contrib.groupBy("dst").agg(
            F.sum("c").cast("double").alias("in_sum")
        )
        ranks = (
            nodes.join(sums, nodes.node == sums.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("in_sum", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Global triangle census of the undirected page graph: node /
    edge / wedge / triangle counts and the global clustering
    coefficient (3T/W).

    Compact-forward algorithm: every undirected edge is ORIENTED from
    its lower endpoint to its higher endpoint under the (degree, id)
    total order, so each triangle is counted exactly once at its
    lowest-degree corner and — the scale property — the per-node
    join fan-out is bounded by the node's FORWARD degree, which
    degree-ordering keeps small even for hubs (the standard fix for
    the quadratic wedge blow-up a raw id-orientation suffers on
    skewed graphs). Two equi-joins, no window over full history;
    wedge counts come from one degree aggregation. The DuckDB oracle
    enumerates id-ordered triangles instead — orientation changes the
    join cost, never the count."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    with_deg = (
        und.join(deg.withColumnRenamed("v", "a"), "a")
        .withColumnRenamed("deg", "deg_a")
        .join(
            deg.withColumnRenamed("v", "b").withColumnRenamed(
                "deg", "deg_b"
            ),
            "b",
        )
    )
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    wedge_pairs = o1.join(
        o2,
        (F.col("o1.u") == F.col("o2.u")) & (F.col("o1.v") < F.col("o2.v")),
    ).select(
        F.least("o1.v", "o2.v").alias("a"),
        F.greatest("o1.v", "o2.v").alias("b"),
    )
    triangles = wedge_pairs.join(und, ["a", "b"], "left_semi").count()
    stats = deg.agg(
        F.count("*").alias("n_nodes"),
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2)
        .cast("long")
        .alias("n_wedges"),
    ).collect()[0]
    n_edges = und.count()
    spark = edges.sparkSession
    coeff = (
        3.0 * triangles / stats["n_wedges"] if stats["n_wedges"] else None
    )
    return spark.createDataFrame(
        [
            (
                stats["n_nodes"],
                n_edges,
                stats["n_wedges"],
                triangles,
                coeff,
            )
        ],
        "n_nodes long, n_edges long, n_wedges long, n_triangles long, "
        "global_clustering double",
    )


# ---------------------------------------------------------------------------
# community detection: synchronous weighted label propagation

LPA_ITER = 5


def label_propagation(edges: DataFrame, *, n_iter: int = LPA_ITER) -> DataFrame:
    """Deterministic synchronous weighted label propagation over the
    undirected form of (src, dst, n_transitions) edges.

    Labels start as the node id; each round EVERY node simultaneously
    adopts the label with the largest summed edge weight among its
    neighbors, ties broken by the smallest label. No RNG and no
    asynchronous update order — with integer weights the whole
    algorithm is exact, so (unlike PageRank's float ranks) the
    catalog query carries a FULL DuckDB value oracle: the same rounds
    unrolled as SQL stages.

    Scale shape: one edge-table symmetrization up front, then per
    round one equi-join (labels onto the neighbor key) + one grouped
    sum + one per-node argmax (WindowGroupLimit-able top-1). Label
    state is node-table-sized and localCheckpoints every round to
    keep lineage flat — the same Pregel-on-DataFrames discipline as
    ``pagerank``/``neardup_clusters``.
    """
    sym = (
        edges.select(
            F.col("src").alias("node"),
            F.col("dst").alias("nbr"),
            F.col("n_transitions").alias("w"),
        )
        .unionByName(
            edges.select(
                F.col("dst").alias("node"),
                F.col("src").alias("nbr"),
                F.col("n_transitions").alias("w"),
            )
        )
        .groupBy("node", "nbr")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    labels = sym.select("node").distinct().select(
        "node", F.col("node").alias("lbl")
    ).localCheckpoint(eager=True)
    w_rank = Window.partitionBy("node").orderBy(
        F.col("s").desc(), F.col("lbl").asc()
    )
    for _ in range(n_iter):
        nbr_lbl = sym.join(
            labels.select(F.col("node").alias("nbr"), "lbl"), "nbr"
        )
        scored = nbr_lbl.groupBy("node", "lbl").agg(F.sum("w").alias("s"))
        labels = (
            scored.withColumn("rn", F.row_number().over(w_rank))
            .filter(F.col("rn") == 1)
            .select("node", "lbl")
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("lbl").alias("community"))
