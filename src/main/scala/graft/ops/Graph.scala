package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph compute beyond connected components: PageRank as
  * relational joins + aggregates — the "importance over a link graph"
  * signal a corpus pipeline uses to weight crawled documents.
  *
  * Each iteration is one equi-join (ranks onto edges by source) and one
  * aggregation (contributions by destination): the same two-shuffle shape
  * per round at any scale, no driver-side state, `localCheckpoint` per
  * round to keep lineage flat (as in Dedup.connectedComponents).
  *
  * Cross-engine determinism (the oracle gate): per-edge contributions are
  * IEEE double divisions (exact), SUMMED via DECIMAL(28,18) — exact and
  * partition-order-independent — and the damping blend is the identical
  * double expression both sides. Any engine computing the same unrolled
  * iterations matches bit-for-bit (SparkEntry q101 pins 2 iterations).
  */
object Graph {

  /** `iters` PageRank rounds over directed `edges` (duplicate edges are
    * collapsed). Nodes with no out-edges contribute nothing (their mass
    * leaks — the standard simplification when ranks are used as relative
    * weights, documented rather than redistributed). Returns (node, rank).
    */
  def pageRank(edges: DataFrame, src: Column, dst: Column,
               iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(src.as("src"), dst.as("dst")).distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val outDeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
    val nNodes = nodes.count()
    // empty graph: no nodes to rank — return the empty (node, rank) frame
    // rather than dividing the initial mass by zero under ANSI mode
    if (nNodes == 0L) return nodes.withColumn("rank", lit(0.0d))
    val n = lit(nNodes.toDouble)
    val base = lit(1.0d - damping) / n
    var ranks = nodes.withColumn("rank", lit(1.0d) / n)
    (1 to iters).foreach { _ =>
      val contrib = ranks.join(outDeg, Seq("node"))
        .join(e, col("node") === col("src"))
        .select(col("dst"), (col("rank") / col("outdeg")).as("c"))
      val summed = contrib.groupBy(col("dst").as("node"))
        .agg(sum(col("c").cast("decimal(28,18)")).cast("double").as("in_mass"))
      ranks = nodes.join(summed, Seq("node"), "left")
        .select(col("node"),
          (base + lit(damping) * coalesce(col("in_mass"), lit(0.0d)))
            .as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
