package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for corpus curation — the domain-authority signal
  * crawl pipelines rank hosts by (Common Crawl publishes exactly such a
  * link-graph ranking; curation uses it as a quality prior and a crawl
  * frontier weight). Plain PageRank with teleport damping d = 17/20 = 0.85,
  * computed in EXACT INTEGER arithmetic so the result is bit-identical at
  * any parallelism and in any engine (the DuckDB oracle unrolls the same
  * iterations):
  *
  *   r₀(v)   = K div N                       (K = 2^scaleBits of rank mass)
  *   cᵢ(u→v) = rᵢ(u) div outdeg(u)           (exact long division per edge)
  *   rᵢ₊₁(v) = (3·K) div (20·N) + (17 · Σ cᵢ(u→v)) div 20
  *
  * Every step is integer floor-division and exact long summation —
  * summation-order-independent, no float drift. Truncation loses < 1 unit
  * of 2^−scaleBits mass per division (and dangling nodes absorb their mass,
  * the classic leaked variant) — ranks decay slightly in total but the
  * ORDERING, which is what curation consumes, is the standard PageRank
  * ordering; the oracle replays the identical truncation.
  *
  * Scale shape: per iteration ONE join of the edge table (partitioned once
  * by src and cached) against the O(N) rank table, one map-side-combining
  * groupBy(dst) for inflow, one left join back to the node spine. Rank
  * tables are cached per iteration and materialized (lineage stays O(1)
  * deep — an uncached loop would replay every prior iteration at each
  * reference, the re-referenced-subtree trap). `handle` owns every cached
  * table's lifetime.
  *
  * Requirements: N ≤ 2^scaleBits (at 10^12 nodes and the default 2^50
  * grid each node still starts with 2^10 units of mass); node ids
  * non-negative longs (`div` truncation == floor only for non-negatives —
  * enforced). Multi-edges weigh multiply; self-loops participate normally.
  */
object PageRank {

  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      scaleBits: Int = 50,
      handle: graft.runtime.CacheHandle = new graft.runtime.CacheHandle
  ): DataFrame = {
    require(iters >= 1, "pageRank needs at least one iteration")
    require(scaleBits >= 20 && scaleBits <= 55, "scaleBits must be in [20, 55]")
    val k = 1L << scaleBits
    val e = handle.track(
      edges
        .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull)
        .repartition(col("src"))
        .cache())
    val nodes = handle.track(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct()
        .cache())
    val n = nodes.count()
    require(n >= 1, "pageRank needs a non-empty graph")
    require(n <= k, s"node count $n exceeds the 2^$scaleBits rank grid")
    require(nodes.where(col("node") < 0).isEmpty,
      "pageRank needs non-negative node ids (integer div == floor only there)")
    val outdeg = handle.track(e.groupBy("src").agg(count(lit(1)).as("odeg")).cache())
    val base = (3L * k) / (20L * n)
    var ranks = handle.track(nodes.select(col("node"), lit(k / n).as("r")).cache())
    for (_ <- 1 to iters) {
      val inflow = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("r div odeg")).as("inflow"))
      val next = handle.track(
        nodes
          .join(inflow, Seq("node"), "left")
          .select(col("node"),
            (lit(base) + expr("(17 * coalesce(inflow, 0L)) div 20")).as("r"))
          .cache())
      next.count() // materialize: lineage stays one iteration deep
      ranks = next
    }
    ranks.select(col("node"), col("r").as("rank_scaled"),
      (col("r").cast("double") / k).as("rank"))
  }
}
