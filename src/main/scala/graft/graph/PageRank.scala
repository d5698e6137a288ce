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

  private case class Graph(
      e: DataFrame, nodes: DataFrame, outdeg: DataFrame, n: Long, base: Long, k: Long)

  private def prepare(
      edges: DataFrame, srcCol: String, dstCol: String, scaleBits: Int,
      handle: graft.runtime.CacheHandle): Graph = {
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
    Graph(e, nodes, outdeg, n, (3L * k) / (20L * n), k)
  }

  /** One iteration of the integer recurrence; caches + materializes the
    * next rank table so lineage stays one iteration deep. */
  private def step(
      g: Graph, ranks: DataFrame, handle: graft.runtime.CacheHandle): DataFrame = {
    val inflow = g.e
      .join(ranks.withColumnRenamed("node", "src"), "src")
      .join(g.outdeg, "src")
      .groupBy(col("dst").as("node"))
      .agg(sum(expr("r div odeg")).as("inflow"))
    val next = handle.track(
      g.nodes
        .join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(g.base) + expr("(17 * coalesce(inflow, 0L)) div 20")).as("r"))
        .cache())
    next.count()
    next
  }

  private def finish(g: Graph, ranks: DataFrame): DataFrame =
    ranks.select(col("node"), col("r").as("rank_scaled"),
      (col("r").cast("double") / g.k).as("rank"))

  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      scaleBits: Int = 50,
      handle: graft.runtime.CacheHandle = new graft.runtime.CacheHandle
  ): DataFrame = {
    require(iters >= 1, "pageRank needs at least one iteration")
    val g = prepare(edges, srcCol, dstCol, scaleBits, handle)
    var ranks = handle.track(g.nodes.select(col("node"), lit(g.k / g.n).as("r")).cache())
    for (_ <- 1 to iters) ranks = step(g, ranks, handle)
    finish(g, ranks)
  }

  /** [[pageRank]] with per-iteration checkpoints (the north-rule resume
    * contract for the LONG iterative job — at 10¹² nodes each sweep is
    * hours, and the rank state is O(N), so losing a run to a crash is the
    * expensive failure). After each iteration the integer rank table is
    * written as parquet under `checkpointDir/iter_<k>` and then marked
    * complete via [[graft.runtime.IterativeCheckpoint]] (marker AFTER data:
    * an unmarked partial write is ignored and overwritten on resume). A
    * restarted run reloads the highest MARKED iteration and continues —
    * exact longs, so the resumed run is bit-identical to the uninterrupted
    * one (GraphSpec). A marker whose (n, scaleBits) disagree with the
    * prepared graph aborts. */
  def pageRankResumable(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      checkpointDir: String,
      scaleBits: Int = 50,
      handle: graft.runtime.CacheHandle = new graft.runtime.CacheHandle
  ): DataFrame = {
    import graft.runtime.IterativeCheckpoint
    require(iters >= 1, "pageRank needs at least one iteration")
    val g = prepare(edges, srcCol, dstCol, scaleBits, handle)
    val spark = edges.sparkSession
    var done = 0
    var ranks: DataFrame = null
    IterativeCheckpoint.latest(spark, checkpointDir).foreach { case (it, json) =>
      require(it <= iters, s"checkpoint is at iteration $it but only $iters requested")
      require(json == marker(g, scaleBits),
        s"checkpoint $json does not match this graph (${marker(g, scaleBits)})")
      done = it
      ranks = handle.track(
        spark.read.parquet(s"$checkpointDir/iter_$it").select("node", "r").cache())
      ranks.count()
    }
    if (done == 0) {
      ranks = handle.track(g.nodes.select(col("node"), lit(g.k / g.n).as("r")).cache())
    }
    // a resumed run may find older iterations a crash left behind — prune
    // everything below the one we resumed from (see prune ordering below)
    prune(spark, checkpointDir, below = done)
    for (it <- done + 1 to iters) {
      ranks = step(g, ranks, handle)
      // data first (overwrite clears any unmarked partial), marker second
      ranks.write.mode("overwrite").parquet(s"$checkpointDir/iter_$it")
      IterativeCheckpoint.save(spark, checkpointDir, it, marker(g, scaleBits))
      // the rank table is O(N) — keep only the newest iteration's data.
      // Deletion is marker FIRST, then parquet: a crash in between leaves
      // an unmarked orphan dir (space, reclaimed by the next prune), never
      // a marked iteration whose data is gone.
      prune(spark, checkpointDir, below = it)
    }
    finish(g, ranks)
  }

  private def prune(spark: org.apache.spark.sql.SparkSession,
      checkpointDir: String, below: Int): Unit = {
    import graft.runtime.IterativeCheckpoint
    IterativeCheckpoint.iterations(spark, checkpointDir).filter(_ < below).foreach { j =>
      IterativeCheckpoint.deleteMarker(spark, checkpointDir, j)
      val p = new org.apache.hadoop.fs.Path(s"$checkpointDir/iter_$j")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  private def marker(g: Graph, scaleBits: Int): String =
    s"""{"n":${g.n},"scaleBits":$scaleBits}"""

  /** Per-node link statistics — the crawl-frontier / link-farm
    * observability companion to [[pageRank]]: out/in edge counts, distinct
    * neighbor counts, and the RECIPROCAL distinct-link count (u→v where
    * v→u also exists — mutual-link density is the classic link-farm
    * signal). Scale shape: one distinct-edge projection, two
    * map-side-combining groupBys and one self-equi-join of the distinct
    * edge table with itself (shuffle O(E)); the node spine keeps
    * zero-degree sides via outer joins, so every node appears once.
    * Multi-edges count in `out_edges`/`in_edges` and collapse in the
    * distinct/reciprocal columns. */
  def linkStats(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      handle: graft.runtime.CacheHandle = new graft.runtime.CacheHandle
  ): DataFrame = {
    val e = handle.track(
      edges
        .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull)
        .cache())
    val de = handle.track(e.distinct().cache())
    val outs = e.groupBy(col("src").as("node")).agg(
      count(lit(1)).as("out_edges"))
    val ins = e.groupBy(col("dst").as("node")).agg(
      count(lit(1)).as("in_edges"))
    val douts = de.groupBy(col("src").as("node")).agg(
      count(lit(1)).as("out_distinct"))
    val dins = de.groupBy(col("dst").as("node")).agg(
      count(lit(1)).as("in_distinct"))
    val recip = de.as("f")
      .join(de.select(col("src").as("dst"), col("dst").as("src")).as("b"),
        Seq("src", "dst"))
      .groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("reciprocal"))
    val nodes = de.select(col("src").as("node"))
      .union(de.select(col("dst").as("node"))).distinct()
    nodes
      .join(outs, Seq("node"), "left")
      .join(ins, Seq("node"), "left")
      .join(douts, Seq("node"), "left")
      .join(dins, Seq("node"), "left")
      .join(recip, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("out_edges"), lit(0L)).as("out_edges"),
        coalesce(col("in_edges"), lit(0L)).as("in_edges"),
        coalesce(col("out_distinct"), lit(0L)).as("out_distinct"),
        coalesce(col("in_distinct"), lit(0L)).as("in_distinct"),
        coalesce(col("reciprocal"), lit(0L)).as("reciprocal"))
  }
}
