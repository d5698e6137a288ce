package graft.stats

import org.apache.commons.math3.distribution.ChiSquaredDistribution
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** χ² / Fisher-exact association tests per categorical feature vs outcome
  * (/root/reference/R/step_select_xtab.R:93–149).
  *
  * Semantics pinned to R stats::chisq.test:
  *  - statistic over the observed vs expected contingency table,
  *  - Yates continuity correction ONLY for 2×2 tables (R default `correct`),
  *    with the correction term min(|o−e|, 0.5) subtraction capped as in R
  *    (|o−e| − 0.5, floored at 0 via min(0.5, |o−e|)),
  *  - p = upper tail of χ²_{(r−1)(c−1)} (commons-math3, deterministic),
  *  - optional Benjamini–Hochberg adjustment over the feature p-vector
  *    (step_select_xtab.R:126–128) on the driver,
  *  - Fisher exact for 2×2 tables (two-sided, hypergeometric enumeration).
  *
  * Scale shape: ONE groupBy(feature, xb, yb).count() shuffle builds every
  * contingency table; the per-table statistic is computed over the tiny
  * counts result (collected — O(p · levels²)).
  */
object ChiSq {

  /** Contingency counts for all features in one pass from long categorical
    * form (feature, xb, yb); complete cases only. */
  def contingency(long: DataFrame): DataFrame =
    long
      .where(col("xb").isNotNull && col("yb").isNotNull)
      .groupBy("feature", "xb", "yb")
      .agg(count(lit(1)).as("c"))

  /** χ² statistic + df + p for one observed table (rows × cols of counts). */
  def chisqTest(obs: Array[Array[Double]]): (Double, Int, Double) = {
    val r = obs.length
    val c = obs(0).length
    val rowSum = obs.map(_.sum)
    val colSum = (0 until c).map(j => obs.map(_(j)).sum).toArray
    val n = rowSum.sum
    val yates = r == 2 && c == 2
    var stat = 0.0
    for (i <- 0 until r; j <- 0 until c) {
      val e = rowSum(i) * colSum(j) / n
      if (e > 0) {
        val d0 = math.abs(obs(i)(j) - e)
        val d = if (yates) d0 - math.min(0.5, d0) else d0
        stat += d * d / e
      }
    }
    val df = (r - 1) * (c - 1)
    val p =
      if (df <= 0) Double.NaN
      else 1.0 - new ChiSquaredDistribution(df.toDouble).cumulativeProbability(stat)
    (stat, df, p)
  }

  /** Two-sided Fisher exact test for a 2×2 table (R fisher.test default):
    * sum of probabilities of all tables with the same margins whose
    * hypergeometric probability is <= that of the observed table (within
    * R's 1+1e-7 relative tolerance). */
  def fisherExact2x2(a: Long, b: Long, c: Long, d: Long): Double = {
    val m = a + b // row 1
    val n0 = c + d // row 2
    val k = a + c // col 1
    def lgamma(x: Double) = org.apache.commons.math3.special.Gamma.logGamma(x)
    def lchoose(nn: Long, kk: Long): Double =
      lgamma(nn + 1.0) - lgamma(kk + 1.0) - lgamma(nn - kk + 1.0)
    val total = lchoose(m + n0, k)
    def logP(x: Long): Double = lchoose(m, x) + lchoose(n0, k - x) - total
    val lo = math.max(0L, k - n0)
    val hi = math.min(k, m)
    val obsLogP = logP(a)
    val cutoff = obsLogP + math.log(1 + 1e-7)
    var p = 0.0
    var x = lo
    while (x <= hi) {
      val lp = logP(x)
      if (lp <= cutoff) p += math.exp(lp)
      x += 1
    }
    math.min(1.0, p)
  }

  /** Two-sided Fisher exact for an r×c table by full enumeration of every
    * table with the observed margins — R stats::fisher.test semantics for
    * tables larger than 2×2 (the reference calls fisher.test on ANY table,
    * step_select_xtab.R:96): p = Σ P(T) over tables whose multivariate
    * hypergeometric mass P(T) <= P(obs)·(1 + 1e-7). Enumeration is bounded
    * by `budget` visited states; beyond it (the regime where R's FEXACT
    * needs workspace tuning and typically errors) returns None. */
  def fisherExactRxC(obs: Array[Array[Long]], budget: Long = 20000000L): Option[Double] = {
    val r = obs.length
    val c = obs(0).length
    if (r == 2 && c == 2)
      return Some(fisherExact2x2(obs(0)(0), obs(0)(1), obs(1)(0), obs(1)(1)))
    val rowSum = obs.map(_.sum)
    val colSum = (0 until c).map(j => obs.map(_(j)).sum).toArray
    val n = rowSum.sum
    def lg(x: Long) = org.apache.commons.math3.special.Gamma.logGamma(x + 1.0)
    // log P(T) = Σ lg(rowSums) + Σ lg(colSums) − lg(n) − Σ_ij lg(t_ij)
    val logConst = rowSum.map(lg).sum + colSum.map(lg).sum - lg(n)
    val obsLogP = logConst - obs.flatten.map(lg).sum
    val cutoff = obsLogP + math.log1p(1e-7)
    var states = 0L
    var p = 0.0
    var exceeded = false
    // DFS over free cells (rows 0..r-2, cols 0..c-2); last column/row forced.
    // acc = −Σ lg(filled cells). remCols mutated in place, restored on unwind.
    val remCols = colSum.clone()
    def go(i: Int, j: Int, remRow: Long, acc: Double): Unit = {
      if (exceeded) return
      states += 1
      if (states > budget) { exceeded = true; return }
      if (i == r - 1) {
        // last row forced to the remaining column sums
        val lp = logConst + acc - (0 until c).map(j2 => lg(remCols(j2))).sum
        if (lp <= cutoff) p += math.exp(lp)
      } else if (j == c - 1) {
        // last cell of a free row forced to the row remainder
        if (remRow <= remCols(j)) {
          remCols(j) -= remRow
          go(i + 1, 0, rowSum(i + 1), acc - lg(remRow))
          remCols(j) += remRow
        }
      } else {
        val tailCap = (j + 1 until c).map(remCols(_)).sum
        val lo = math.max(0L, remRow - tailCap)
        val hi = math.min(remRow, remCols(j))
        var v = lo
        while (v <= hi && !exceeded) {
          remCols(j) -= v
          go(i, j + 1, remRow - v, acc - lg(v))
          remCols(j) += v
          v += 1
        }
      }
    }
    go(0, 0, rowSum(0), 0.0)
    if (exceeded) None else Some(math.min(1.0, p))
  }

  /** Per-feature p-values from long form. Features whose table degenerates
    * (single row/col) get None (R chisq.test errors → NA,
    * step_select_xtab.R:99–104). */
  def pValues(long: DataFrame, fisher: Boolean = false): Map[String, Option[Double]] = {
    val counts = contingency(long).collect()
    counts
      .groupBy(_.getString(0))
      .map { case (feature, rows) =>
        val xs = rows.map(_.get(1).toString).distinct.sorted
        val ys = rows.map(_.get(2).toString).distinct.sorted
        val p: Option[Double] =
          if (xs.length < 2 || ys.length < 2) None
          else if (fisher) {
            val m = rows.map(r => (r.get(1).toString, r.get(2).toString) -> r.getLong(3)).toMap
            val tab = Array.tabulate(xs.length, ys.length)((i, j) => m.getOrElse((xs(i), ys(j)), 0L))
            fisherExactRxC(tab) // None iff enumeration exceeds budget (R FEXACT limit)
          } else {
            val obs = Array.ofDim[Double](xs.length, ys.length)
            rows.foreach { r =>
              obs(xs.indexOf(r.get(1).toString))(ys.indexOf(r.get(2).toString)) = r.getLong(3).toDouble
            }
            val (_, _, pv) = chisqTest(obs)
            if (pv.isNaN) None else Some(pv)
          }
        feature -> p
      }
  }

  /** Full xtab scoring: p-values (optionally Fisher), sorted ascending, then
    * BH-adjusted if fdr (matching the sort-then-adjust order of
    * step_select_xtab.R:125–128). Returns (feature, adjusted p) in ascending
    * p order; None p-values stay None. */
  def xtabScores(long: DataFrame, fisher: Boolean, fdr: Boolean): Seq[(String, Option[Double])] = {
    val pv = pValues(long, fisher).toSeq
    val present = pv.collect { case (f, Some(p)) => (f, p) }.sortBy(_._2)
    val absent = pv.collect { case (f, None) => (f, None: Option[Double]) }
    val adjusted =
      if (fdr) {
        val adj = graft.select.DualFilter.bhAdjust(present.map(_._2))
        present.map(_._1).zip(adj.map(Option(_)))
      } else present.map { case (f, p) => (f, Option(p)) }
    adjusted ++ absent
  }
}
