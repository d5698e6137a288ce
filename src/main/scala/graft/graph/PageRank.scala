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
    // ONE validation action (count + min in the same job — these tiny
    // sequential driver jobs are the measured floor of the graph queries)
    val stats = nodes.agg(count(lit(1)), min("node")).collect()(0)
    val n = stats.getLong(0)
    require(n >= 1, "pageRank needs a non-empty graph")
    require(n <= k, s"node count $n exceeds the 2^$scaleBits rank grid")
    require(stats.getLong(1) >= 0,
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
    for (_ <- 1 to iters) {
      val next = step(g, ranks, handle) // step() materializes `next`
      // superseded rank tables otherwise stay pinned until release() —
      // O(iters·N) storage AND a growing CacheManager sameResult scan per
      // action (the halfStep lesson below)
      ranks.unpersist(blocking = false)
      ranks = next
    }
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
    * one (GraphSpec). The marker fingerprints the GRAPH, not just its
    * shape — (n, scaleBits, edge count, an order-independent exact digest
    * of the edge multiset) — so a checkpoint directory from a different
    * edge set aborts instead of silently continuing the wrong run. After
    * each write the live rank lineage is RE-ROOTED on the just-written
    * parquet, so pruning the previous iteration can never strand a cache
    * recomputation (cache loss walks back to durable data, not to a
    * deleted file). */
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
    // order-independent exact edge digest: decimal(38,0) sum of per-edge
    // hashes (the runtime/Lineage accumulation convention — a long sum
    // would overflow ANSI-fatally at corpus scale)
    val fpRow = g.e.agg(count(lit(1)),
      sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)"))).collect()(0)
    val mk = marker(g, scaleBits, fpRow.getLong(0), fpRow.getDecimal(1).toBigInteger.toString)
    var done = 0
    var ranks: DataFrame = null
    IterativeCheckpoint.latest(spark, checkpointDir).foreach { case (it, json) =>
      require(it <= iters, s"checkpoint is at iteration $it but only $iters requested")
      require(json == mk, s"checkpoint $json does not match this graph ($mk)")
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
      val stepped = step(g, ranks, handle) // materialized by step()
      // data first (overwrite clears any unmarked partial), marker second
      stepped.write.mode("overwrite").parquet(s"$checkpointDir/iter_$it")
      IterativeCheckpoint.save(spark, checkpointDir, it, mk)
      // RE-ROOT on the durable copy before pruning: the new cache's
      // lineage bottoms on iter_<it>'s parquet, so losing cache blocks
      // after iter_<it-1> is deleted recomputes from disk, never from the
      // pruned file. Superseded caches unpersist immediately (O(iters·N)
      // pin + per-action CacheManager scan otherwise).
      stepped.unpersist(blocking = false)
      ranks.unpersist(blocking = false)
      ranks = handle.track(
        spark.read.parquet(s"$checkpointDir/iter_$it").select("node", "r").cache())
      // the rank table is O(N) — keep only the newest iteration's data.
      // Deletion is marker FIRST, then parquet: a crash in between leaves
      // an unmarked orphan dir, reclaimed by the next prune (prune lists
      // DATA directories as well as markers for exactly this reason);
      // never a marked iteration whose data is gone.
      prune(spark, checkpointDir, below = it)
    }
    finish(g, ranks)
  }

  /** Delete every iteration artifact below `below` — markers AND data
    * directories, including unmarked orphans from a crash mid-delete or
    * mid-write (marker first, then data; see call sites). */
  private def prune(spark: org.apache.spark.sql.SparkSession,
      checkpointDir: String, below: Int): Unit = {
    val root = new org.apache.hadoop.fs.Path(checkpointDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val Marker = "iter_(\\d+)\\.json".r
    val Data = "iter_(\\d+)".r
    fs.listStatus(root).foreach { st =>
      val k = st.getPath.getName match {
        case Marker(j) => Some(j.toInt)
        case Data(j)   => Some(j.toInt)
        case _         => None
      }
      k.filter(_ < below).foreach { j =>
        graft.runtime.IterativeCheckpoint.deleteMarker(spark, checkpointDir, j)
        fs.delete(new org.apache.hadoop.fs.Path(root, s"iter_$j"), true)
      }
    }
  }

  private def marker(g: Graph, scaleBits: Int, edgeCount: Long, digest: String): String =
    s"""{"n":${g.n},"scaleBits":$scaleBits,"edges":$edgeCount,"digest":"$digest"}"""

  /** HITS hubs-and-authorities (Kleinberg) in EXACT INTEGER arithmetic —
    * the second link-centrality signal curation uses (authorities ≈
    * content quality, hubs ≈ directory/link pages; the hub score is also a
    * link-farm discriminator PageRank alone misses). The classical
    * algorithm L2-normalizes each half-step — irreproducible in floats at
    * scale — so this engine renormalizes by POWER-OF-TWO DOWNSHIFT
    * instead: after each half-step, scores shift right just enough to pull
    * the maximum back under the 2^scaleBits grid,
    *
    *   shift = max(0, bitlen(max_v raw(v)) − scaleBits),   x >> shift,
    *
    * which is exact integer division by 2^shift — deterministic at any
    * parallelism (sums are exact longs, the max is exact, the shift is a
    * pure function of it) and bit-replayable in SQL (the oracle unrolls
    * the same comparisons). Normalization by a CONSTANT factor per
    * half-step preserves the score RATIOS up to uniform truncation, which
    * is what ranking consumes.
    *
    * Scale shape: per half-step one edge⋈score join + one
    * map-side-combining groupBy (O(E) shuffle), one 1-row max aggregate
    * driver-side, score tables cached/materialized per step (O(1)-deep
    * lineage). Overflow guard: sums reach at most
    * maxDegree · 2^scaleBits, so the operator ABORTS unless
    * maxDegree < 2^(62 − scaleBits) (the loud-guard convention).
    *
    * Returns (node, hub_scaled, auth_scaled) — integers on the 2^scaleBits
    * grid. Nodes with no out-edges have hub 0 after one iteration;
    * likewise auth for no in-edges. */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      scaleBits: Int = 40,
      handle: graft.runtime.CacheHandle = new graft.runtime.CacheHandle
  ): DataFrame = {
    require(iters >= 1, "hits needs at least one iteration")
    require(scaleBits >= 20 && scaleBits <= 50, "scaleBits must be in [20, 50]")
    val g = prepare(edges, srcCol, dstCol, scaleBits, handle)
    val spark = edges.sparkSession
    // one action for both degree maxima (union of the two degree tables)
    val maxDeg = g.outdeg.select(col("odeg").as("d"))
      .union(g.e.groupBy("dst").agg(count(lit(1)).as("d")).select("d"))
      .agg(max("d")).collect()(0).getLong(0)
    require(maxDeg < (1L << (62 - scaleBits)),
      s"max degree $maxDeg would overflow the 2^$scaleBits HITS grid — lower scaleBits")
    def shiftOf(maxRaw: Long): Int = {
      val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(maxRaw)
      math.max(0, bitlen - scaleBits)
    }
    // one half-step: inflow sum over `join` edges, renormalizing downshift.
    // `raw` is deliberately NOT cached although it is referenced twice (max
    // agg + out join): both references read the CACHED scores/nodes inputs,
    // so the recompute is one tiny join+agg — whereas each extra cache
    // entry carrying a deep iterative plan makes EVERY subsequent action's
    // CacheManager lookup run sameResult against it (measured: caching raw
    // took 3 iterations on an 8-edge graph from 3.9 s to 70 s)
    def halfStep(scores: DataFrame, fromCol: String, toCol: String): DataFrame = {
      val raw = g.e.join(scores.withColumnRenamed("node", fromCol), fromCol)
        .groupBy(col(toCol).as("node"))
        .agg(sum("s").as("raw"))
      val maxRaw = raw.agg(max("raw")).collect()(0).getLong(0)
      // cached but NOT eagerly counted: the NEXT half-step's max-collect
      // reads this table and fills its cache (halving the sequential
      // driver-action count, ~0.5 s each at bench SF)
      handle.track(
        g.nodes.join(raw, Seq("node"), "left")
          .select(col("node"),
            shiftright(coalesce(col("raw"), lit(0L)), shiftOf(maxRaw)).as("s"))
          .cache())
    }
    // LAG-2 unpersist: producing table t_k materializes t_{k-1} (the
    // max-collect reads it), so t_{k-2} is then both SUPERSEDED and no
    // longer reachable by any pending lazy cache fill — unpersisting it
    // bounds pinned state to 3 tables instead of O(iters) (the CacheManager
    // sameResult lesson) without paying an eager count per half-step.
    val made = scala.collection.mutable.ArrayBuffer[DataFrame](
      handle.track(g.nodes.select(col("node"), lit(g.k).as("s")).cache()))
    for (_ <- 1 to iters) {
      made += halfStep(made.last, "src", "dst") // auth(v) = Σ_{u→v} hub(u)
      if (made.size >= 3) made(made.size - 3).unpersist(blocking = false)
      made += halfStep(made.last, "dst", "src") // hub(u) = Σ_{u→v} auth(v)
      if (made.size >= 3) made(made.size - 3).unpersist(blocking = false)
    }
    val hub = made.last
    val auth = made(made.size - 2)
    hub.select(col("node"), col("s").as("hub_scaled"))
      .join(auth.select(col("node"), col("s").as("auth_scaled")), "node")
  }

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
    // self-loops are excluded from reciprocity: a page linking to itself is
    // not mutual-link density (the link-farm signal this column measures);
    // they still count in the degree columns, like pageRank's "self-loops
    // participate normally" convention
    val recip = de.where(col("src") =!= col("dst")).as("f")
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
