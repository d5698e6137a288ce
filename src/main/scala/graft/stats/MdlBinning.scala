package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fayyad–Irani MDL discretization (Fayyad & Irani 1993) — the method
  * FSelectorRcpp applies to numeric predictors in CLASSIFICATION mode
  * (`equal = FALSE`, /root/reference/R/step_select_infgain.R:138–149:
  * `equal` is TRUE only for regression). Recursively splits at the
  * class-entropy-minimizing boundary, accepting a split only if the
  * information gain passes the MDL criterion:
  *
  *   Gain(A,T;S) > log2(N−1)/N + Δ(A,T;S)/N
  *   Δ = log2(3^k − 2) − [k·Ent(S) − k1·Ent(S1) − k2·Ent(S2)]   (bits)
  *
  * Scale shape: ONE distributed pass per feature set builds the per-
  * (feature, value, class) count table (map-side combined — carries
  * |distinct values|·|classes| rows); the recursion then runs on the
  * driver over prefix-summed count arrays. Continuous columns with
  * extreme cardinality should be quantile-pre-binned by the caller
  * (e.g. exactCuts with 10k bins) to bound the count table — standard
  * practice in distributed MDL implementations.
  */
object MdlBinning {

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)

  private def entropyBits(counts: Array[Long]): Double = {
    val n = counts.sum.toDouble
    if (n == 0) return 0.0
    var h = 0.0
    counts.foreach { c => if (c > 0) { val p = c / n; h -= p * log2(p) } }
    h
  }

  /** Recursive MDL cut search over sorted distinct values with per-class
    * counts. Returns accepted cut values (split at value v ⇒ x <= v goes
    * left), ascending. */
  def mdlCutsLocal(values: Array[Double], classCounts: Array[Array[Long]]): Seq[Double] = {
    val nClasses = if (classCounts.isEmpty) 0 else classCounts(0).length
    // prefix sums per class for O(1) range counts
    val prefix = Array.ofDim[Long](values.length + 1, nClasses)
    for (i <- values.indices; c <- 0 until nClasses)
      prefix(i + 1)(c) = prefix(i)(c) + classCounts(i)(c)

    def range(lo: Int, hi: Int): Array[Long] = // [lo, hi) over value indices
      Array.tabulate(nClasses)(c => prefix(hi)(c) - prefix(lo)(c))

    val cuts = scala.collection.mutable.ArrayBuffer.empty[Double]

    def recurse(lo: Int, hi: Int): Unit = {
      if (hi - lo < 2) return
      val total = range(lo, hi)
      val n = total.sum.toDouble
      val entS = entropyBits(total)
      var best = -1
      var bestE = Double.MaxValue
      var i = lo + 1
      while (i < hi) {
        val left = range(lo, i)
        val right = range(i, hi)
        val nl = left.sum.toDouble
        val e = (nl / n) * entropyBits(left) + ((n - nl) / n) * entropyBits(right)
        if (e < bestE) { bestE = e; best = i }
        i += 1
      }
      if (best < 0) return
      val left = range(lo, best)
      val right = range(best, hi)
      val gain = entS - bestE
      val k = total.count(_ > 0)
      val k1 = left.count(_ > 0)
      val k2 = right.count(_ > 0)
      val delta = log2(math.pow(3, k) - 2) -
        (k * entS - k1 * entropyBits(left) - k2 * entropyBits(right))
      val threshold = log2(n - 1) / n + delta / n
      if (gain > threshold) {
        cuts += values(best - 1) // x <= values(best-1) goes left
        recurse(lo, best)
        recurse(best, hi)
      }
    }

    recurse(0, values.length)
    cuts.sorted.toSeq
  }

  /** Distributed MDL cuts for every feature in `features` vs the (string)
    * class column, in ONE aggregation pass. Returns feature → cut values.
    * Features where MDL accepts no split get an empty cut list (single bin
    * — FSelectorRcpp then scores them 0).
    *
    * Driver safety at scale: the collected table is |distinct values| ×
    * |classes| per feature. Continuous columns are first quantized to at
    * most `maxCandidates` exact-quantile candidate cut positions (one extra
    * distributed stats pass) so a 10^12-row continuous column collects
    * ~maxCandidates rows, not 10^12 — the standard large-scale MDL
    * treatment; candidate quantization only coarsens WHERE a cut can fall,
    * not the MDL decision rule. */
  def mdlCuts(
      df: DataFrame,
      features: Seq[String],
      classCol: String,
      maxCandidates: Int = 65536
  ): Map[String, Seq[Double]] = {
    if (features.isEmpty) return Map.empty
    val distincts = df.select(
      features.map(f => approx_count_distinct(col(f)).as(f)): _*).head()
    val wide = features.zipWithIndex.filter { case (_, i) =>
      distincts.getLong(i) > maxCandidates
    }.map(_._1)
    val quantized =
      if (wide.isEmpty) df
      else {
        // exactCutsMany, NOT exactCuts: 65k candidate probes need the
        // histogram + two-phase-prefix-sum path (exactCuts' per-probe
        // bracket machinery collects every distinct value at this width)
        val cuts = Binning.exactCutsMany(df, wide, maxCandidates)
        wide.foldLeft(df) { (d, f) =>
          // snap each value to its candidate bin's upper cut (cut VALUES
          // stay on the data scale). Native binary search, NOT the
          // binByCuts+element_at chain: 65k cuts would build a 65k-deep
          // CaseWhen and a 65k-wide CreateArray — Catalyst's recursive
          // transforms overflow the stack on a tree that deep (SnapUp is
          // spec-pinned equal to the chain at small widths)
          d.withColumn(f, graft.functions.SnapUp.of(col(f), cuts(f)))
        }
      }
    val long = graft.core.Melt
      .numeric(quantized, features, keep = Seq(classCol))
      .where(col("value").isNotNull && col(classCol).isNotNull)
    val counts = long
      .groupBy(col("feature"), col("value"), col(classCol).as("cls"))
      .agg(count(lit(1)).as("c"))
      .collect()
    val classes = counts.map(_.getString(2)).distinct.sorted
    val classIdx = classes.zipWithIndex.toMap
    counts.groupBy(_.getString(0)).map { case (f, rows) =>
      val byValue = rows.groupBy(_.getDouble(1)).toArray.sortBy(_._1)
      val values = byValue.map(_._1)
      val cc = byValue.map { case (_, rs) =>
        val arr = new Array[Long](classes.length)
        rs.foreach(r => arr(classIdx(r.getString(2))) += r.getLong(3))
        arr
      }
      f -> mdlCutsLocal(values, cc)
    }
  }
}
