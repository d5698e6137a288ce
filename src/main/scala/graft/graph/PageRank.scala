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
      e: DataFrame, nodes: DataFrame, outdeg: DataFrame, hot: Option[DataFrame],
      nSalts: Int, n: Long, base: Long, k: Long)

  private val NSalts = 16

  private def prepare(
      edges: DataFrame, srcCol: String, dstCol: String, scaleBits: Int,
      handle: graft.runtime.CacheHandle, withMaxDegree: Boolean = false,
      saltHotAbove: Long = 0L): (Graph, Long) = {
    require(scaleBits >= 20 && scaleBits <= 55, "scaleBits must be in [20, 55]")
    val k = 1L << scaleBits
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
    val e = handle.track(e0.repartition(col("src")).cache())
    val nodes = handle.track(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct()
        .cache())
    val outdeg = handle.track(e.groupBy("src").agg(count(lit(1)).as("odeg")).cache())
    // ONE validation action (count + min — plus, crossJoined in as 1-row
    // aggregates, the degree maximum when the caller needs it and the
    // HOT-SOURCE count when salting is requested — all in the same job:
    // these tiny sequential driver jobs are the measured floor of the
    // graph queries)
    val statsDf0 = nodes.agg(count(lit(1)).as("n"), min("node").as("mn"))
    val statsDf1 =
      if (!withMaxDegree) statsDf0
      else statsDf0.crossJoin(
        outdeg.select(col("odeg").as("d"))
          .union(e.groupBy("dst").agg(count(lit(1)).as("d")).select("d"))
          .agg(max("d").as("maxd")))
    val statsDf =
      if (saltHotAbove <= 0) statsDf1
      else statsDf1.crossJoin(
        outdeg.agg(count(when(col("odeg") > saltHotAbove, 1)).as("nhot")))
    val stats = statsDf.collect()(0)
    val n = stats.getLong(0)
    require(n >= 1, "pageRank needs a non-empty graph")
    require(n <= k, s"node count $n exceeds the 2^$scaleBits rank grid")
    require(stats.getLong(1) >= 0,
      "pageRank needs non-negative node ids (integer div == floor only there)")
    val maxDeg = if (withMaxDegree) stats.getLong(2) else -1L
    val nHot = if (saltHotAbove <= 0) 0L else stats.getLong(stats.length - 1)
    // HOT-SOURCE SALTING (round-5 verdict finding #3): the cached edge
    // table is partitioned by src so every iteration's rank join reuses it
    // with ZERO E-sized exchanges — but that pre-baked partitioning is
    // exactly where AQE's skew-join splitting cannot help, so one
    // unbounded-out-degree source (follower graphs; web out-degree is
    // page-size-bounded) would straggle silently forever. When the
    // validation action finds sources above `saltHotAbove` out-edges, the
    // edge cache is REBUILT (from the cached unsalted table — one cheap
    // extra pass, paid only by skewed graphs; typical web graphs take the
    // zero-overhead path) partitioned by (src, dst-hash salt), and each
    // iteration replicates only the HOT sources' rank rows (exact: the
    // contribution r div odeg is identical per edge of u). The hot list is
    // a tiny broadcast (out-degree > threshold sources). Multi-edges to
    // ONE dst share a salt and remain unsplittable (deterministic by
    // construction).
    val (eFinal, hotDf) =
      if (nHot == 0L) (e, None)
      else {
        val h = handle.track(
          outdeg.where(col("odeg") > saltHotAbove)
            .select(col("src"), lit(true).as("__hot")).cache())
        val salted = handle.track(
          e.join(broadcast(h), Seq("src"), "left")
            .withColumn("__salt",
              when(col("__hot").isNotNull,
                pmod(xxhash64(col("dst")), lit(NSalts.toLong)).cast("int"))
                .otherwise(lit(0)))
            .drop("__hot")
            .repartition(col("src"), col("__salt"))
            .cache())
        (salted, Some(h))
      }
    (Graph(eFinal, nodes, outdeg, hotDf, NSalts, n, (3L * k) / (20L * n), k), maxDeg)
  }

  /** One iteration of the integer recurrence; caches the next rank table
    * LAZILY — each rank table is referenced exactly once by the next
    * iteration's join, so a single downstream action computes every
    * iteration exactly once while filling the caches bottom-up. The
    * cache is there so that LATER actions on the result (Verify's
    * dump + hash, repeated collects) reuse the last table instead of
    * replaying the loop; eager per-step counts were pure driver-action
    * floor (~0.4 s each at bench SF) on top of that. */
  private def step(
      g: Graph, ranks: DataFrame, handle: graft.runtime.CacheHandle): DataFrame = {
    // per-SOURCE contribution first (r div odeg is constant per src —
    // one division per node instead of one per edge), then replicate only
    // the HOT sources' rows across the salt range; cold rows carry salt 0,
    // matching the cached edge partitioning either way.
    val contrib = ranks.withColumnRenamed("node", "src")
      .join(g.outdeg, "src")
      .select(col("src"), expr("r div odeg").as("c"))
    val joined = g.hot match {
      case None => g.e.join(contrib, "src")
      case Some(h) =>
        val rs = contrib.join(broadcast(h), Seq("src"), "left")
          .select(col("src"), col("c"),
            explode(when(col("__hot").isNotNull,
              sequence(lit(0), lit(g.nSalts - 1))).otherwise(array(lit(0)))).as("__salt"))
        g.e.join(rs, Seq("src", "__salt"))
    }
    val inflow = joined
      .groupBy(col("dst").as("node"))
      .agg(sum("c").as("inflow"))
    handle.track(
      g.nodes
        .join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(g.base) + expr("(17 * coalesce(inflow, 0L)) div 20")).as("r"))
        .cache())
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
      handle: graft.runtime.CacheHandle = new graft.runtime.CacheHandle,
      hotSourceDegree: Long = 1L << 18
  ): DataFrame = {
    require(iters >= 1, "pageRank needs at least one iteration")
    val (g, _) = prepare(edges, srcCol, dstCol, scaleBits, handle,
      saltHotAbove = hotSourceDegree)
    var ranks = handle.track(g.nodes.select(col("node"), lit(g.k / g.n).as("r")).cache())
    var anchor: DataFrame = null // last MATERIALIZED table — pinned so later
    // actions replay at most 8 sweeps, not the whole loop
    for (it <- 1 to iters) {
      val next = step(g, ranks, handle) // lazily cached (see step)
      // superseded rank tables otherwise stay pinned until release() —
      // O(iters·N) storage AND a growing CacheManager sameResult scan per
      // action (the halfStep lesson below). Unpersisting a PENDING lazy
      // cache is always correct: substitution just doesn't happen and the
      // single-reference chain recomputes that step exactly once.
      if (ranks ne anchor) ranks.unpersist(blocking = false)
      ranks = next
      // every 8th iteration, materialize: bounds the replay depth after a
      // cache eviction to 8 O(E) joins and keeps the pending-cache chain
      // short on long runs; costs one driver action per 8 sweeps (for the
      // hours-per-sweep regime use pageRankResumable, which re-roots).
      if (it % 8 == 0 && it < iters) {
        next.count()
        if (anchor != null) anchor.unpersist(blocking = false)
        anchor = next
      }
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
      handle: graft.runtime.CacheHandle = new graft.runtime.CacheHandle,
      hotSourceDegree: Long = 1L << 18
  ): DataFrame = {
    import graft.runtime.IterativeCheckpoint
    require(iters >= 1, "pageRank needs at least one iteration")
    val (g, _) = prepare(edges, srcCol, dstCol, scaleBits, handle,
      saltHotAbove = hotSourceDegree)
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
      val stepped = step(g, ranks, handle) // lazy; the write below is the
      // one action that computes it (and fills the cache en route)
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
    * map-side-combining groupBy (O(E) shuffle, run once per half-step),
    * the 1-row max riding a broadcast scalar join inside the plan (no
    * driver round-trips in the loop), score tables lazily checkpointed
    * per step (O(1)-deep plans). Overflow guard: sums reach at most
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
    // degree maxima fold into prepare's single validation job (one action
    // fewer — these tiny sequential driver jobs are the floor of this query)
    val (g, maxDeg) = prepare(edges, srcCol, dstCol, scaleBits, handle, withMaxDegree = true)
    require(maxDeg < (1L << (62 - scaleBits)),
      s"max degree $maxDeg would overflow the 2^$scaleBits HITS grid — lower scaleBits")
    // one half-step: inflow sum over `join` edges, renormalizing downshift.
    // The downshift is a pure function of the 1-row max(raw), so it rides a
    // broadcast scalar crossJoin INSIDE the plan (the Bm25 sanctioned
    // pattern) instead of a driver round-trip: bitlen(max_raw) is exactly
    // the string length of its base-2 conv (exact for non-negative longs,
    // and raw sums are non-negative), shift = max(0, bitlen − scaleBits),
    // and shiftright with a column shift amount is plain integer >>.
    def halfStep(scores: DataFrame, fromCol: String, toCol: String): DataFrame = {
      // raw is checkpointed too: it is referenced twice (max agg + out
      // join), and both references share one computed+persisted RDD — the
      // O(E) edge⋈score join runs ONCE per half-step, not twice
      val raw = handle.trackCheckpointed(
        g.e.join(scores.withColumnRenamed("node", fromCol), fromCol)
          .groupBy(col(toCol).as("node"))
          .agg(sum("s").as("raw"))
          .localCheckpoint(false))
      val mx = raw.agg(max("raw").as("__max_raw"))
      // LAZY localCheckpoint, not cache(): no action per half-step at all —
      // the caller's one final action computes the whole chain, persisting
      // each step's RDD at first touch so the double raw reference (max agg
      // + out join) shares it. The checkpoint truncates the step's plan to
      // a LogicalRDD LEAF, which is what makes a lazy chain survivable on
      // the driver: with nested lazy CACHES every AQE event re-rendered the
      // doubly-referenced tree (2^halfsteps expansions — measured 86 s of
      // generateTreeString burn); an RDD leaf renders in O(1).
      handle.trackCheckpointed(
        g.nodes.join(raw, Seq("node"), "left")
          .crossJoin(broadcast(mx))
          .select(col("node"),
            call_function("shiftright",
              coalesce(col("raw"), lit(0L)),
              greatest(lit(0),
                length(conv(col("__max_raw").cast("string"), 10, 2)) - lit(scaleBits))).as("s"))
          .localCheckpoint(false))
    }
    // All 2·iters checkpointed RDDs stay persisted until the handle
    // releases them (bounded O(N) each), and zero driver actions happen
    // inside the loop — was: one max-collect per half-step, the measured
    // ~80% of this query's bench time.
    val made = scala.collection.mutable.ArrayBuffer[DataFrame](
      handle.track(g.nodes.select(col("node"), lit(g.k).as("s")).cache()))
    for (_ <- 1 to iters) {
      made += halfStep(made.last, "src", "dst") // auth(v) = Σ_{u→v} hub(u)
      made += halfStep(made.last, "dst", "src") // hub(u) = Σ_{u→v} auth(v)
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
