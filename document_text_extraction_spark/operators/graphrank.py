"""PageRank over a weighted edge list — link-based quality ranking.

Web-corpus pipelines rank hosts/pages by link centrality (Common Crawl
publishes harmonic-centrality rankings; quality-filter stacks use them
as a trust prior). This is the standard damped PageRank with uniform
teleport and uniform dangling-mass redistribution (Brin & Page 1998),
as an iterative DataFrame computation:

* per iteration: one equi-join of ranks onto edges (hash-partitioned on
  the node key) + one map-side-combined sum by destination — shuffle
  volume is O(|E|) per round, never quadratic;
* the dangling mass is a scalar aggregate per round (a driver-side
  float, not a data motion);
* iteration state checkpoints to parquet each round — the same
  plan-growth guard as ``operators.components.connected_components``
  (see there for why ``localCheckpoint`` is avoided).

Determinism: results are float64 sums whose addition order Spark does
not fix; callers comparing across engines should round (the registry
query emits ``round(rank, 6)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, iterations: int = 10,
             damping: float = 0.85,
             src: str = "src", dst: str = "dst",
             weight: str | None = None,
             work_dir: str | None = None) -> DataFrame:
    """(node, rank) after ``iterations`` damped-PageRank rounds.

    ``edges`` is a directed edge list; ``weight`` (optional column)
    multi-counts an edge. Nodes = every distinct src or dst. ``work_dir``
    backs the per-round checkpoints AND the returned DataFrame (same
    lifecycle contract as ``connected_components``)."""
    import tempfile

    spark = edges.sparkSession
    if work_dir is None:
        work_dir = tempfile.mkdtemp(prefix="dte_pr_")
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     w.alias("w"))
    nodes = (e.select(F.col("src").alias("node"))
             .unionAll(e.select(F.col("dst").alias("node")))
             .distinct()).persist()
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        return spark.createDataFrame([], "node string, rank double")
    # normalized transition weight per edge: w / total out-weight(src)
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    trans = (e.join(outw, "src")
             .select("src", "dst", (F.col("w") / F.col("outw"))
                     .alias("p"))).persist()
    dangling = nodes.join(trans.select(F.col("src").alias("node"))
                          .distinct(), "node", "left_anti").persist()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    teleport = (1.0 - damping) / n
    for r in range(iterations):
        dmass = (dangling.join(ranks, "node")
                 .agg(F.sum("rank")).collect()[0][0]) or 0.0
        contrib = (
            trans.join(ranks.select(F.col("node").alias("src"), "rank"),
                       "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("p")).alias("inflow"))
        )
        stepped = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(teleport)
                 + F.lit(damping)
                 * (F.coalesce(F.col("inflow"), F.lit(0.0))
                    + F.lit(dmass / n))).alias("rank"),
            )
        )
        path = f"{work_dir}/ranks_{r % 2}"
        stepped.write.mode("overwrite").parquet(path)
        ranks = spark.read.parquet(path)
    trans.unpersist()
    dangling.unpersist()
    nodes.unpersist()
    return ranks
