package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Correlation-based scores.
  *
  * Pearson covers the reference's carscore `diagonal = TRUE` path — plain
  * marginal correlations (/root/reference/R/step_select_carscore.R:13–14,
  * 133–147; the step stores abs(score)). Spearman = Pearson over per-column
  * mid-ranks. Full CAR (diagonal = FALSE) decorrelates the marginal
  * correlations with the inverse square root of the predictor correlation
  * matrix: ω = R_X^{−1/2} · ρ_{Xy}.
  *
  * Scale shape: all p correlations in ONE aggregation pass (p `corr` aggs in
  * a single `agg`, partial+final). Spearman ranks use one window per column —
  * each a single ordered partition; acceptable for p features ranked in
  * parallel, with the cutpoint-binned approximation available where a global
  * per-column sort is infeasible.
  */
object Correlation {

  /** Pearson corr(x_i, y) for all features in one pass. */
  def pearson(df: DataFrame, features: Seq[String], outcome: String): Map[String, Option[Double]] = {
    if (features.isEmpty) return Map.empty
    val row = df.agg(
      corr(col(features.head), col(outcome)).as(features.head),
      features.tail.map(f => corr(col(f), col(outcome)).as(f)): _*
    ).head()
    features.zipWithIndex.map { case (f, i) =>
      f -> (if (row.isNullAt(i)) None else Some(row.getDouble(i)))
    }.toMap
  }

  /** Spearman corr for all features vs outcome: Pearson over EXACT
    * mid-ranks, computed scalably — ALL per-column rank tables come from ONE
    * melted counts pass (the window runs per feature over DISTINCT values,
    * so no single-partition row sort ever happens; midrank(v) =
    * (#rows with value < v) + (ties(v) + 1) / 2), are cached (tiny: Σ
    * per-column distinct counts — each join-back would otherwise re-execute
    * the melt scan), and joined back per column. Identical results to the
    * naive rank()-window formulation (see ScalableRankSpec/StatsSpec). */
  def spearman(df: DataFrame, features: Seq[String], outcome: String): Map[String, Option[Double]] = {
    if (features.isEmpty) return Map.empty
    val cols = (features :+ outcome).distinct
    val counts = graft.core.Melt.numeric(df, cols)
      .where(col("value").isNotNull)
      .groupBy("feature", "value")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("feature").orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val rankTable = counts.select(
      col("feature"), col("value"),
      (coalesce(sum("cnt").over(w), lit(0L)) + (col("cnt") + 1) / 2.0).as("midrank"))
      .cache()
    try {
      val withRanks = cols.foldLeft(df.select(cols.map(c => col(c).cast("double").as(c)): _*)) { (d, c) =>
        val rt = rankTable.where(col("feature") === c)
          .select(col("value").as(c + "__v"), col("midrank").as(c + "__rank"))
        // no broadcast hint: the rank table is |distinct values| rows —
        // tiny for discrete columns (AQE broadcasts it), up to n for
        // continuous ones (AQE picks a shuffle join; still no global
        // single-partition row sort)
        d.join(rt, d(c) === rt(c + "__v"), "left").drop(c + "__v")
      }
      pearson(
        withRanks.select(cols.map(c => col(c + "__rank").as(c)): _*),
        features,
        outcome
      )
    } finally rankTable.unpersist(blocking = false)
  }

  /** Full p×p Pearson correlation matrix of the features plus the feature–
    * outcome vector, in one aggregation pass of p(p+1)/2 + p corr aggs.
    * Fine for the reference's regime (p small; n huge).
    */
  def corrMatrix(df: DataFrame, features: Seq[String], outcome: String): (Array[Array[Double]], Array[Double]) = {
    val p = features.length
    val pairAggs = for {
      i <- 0 until p; j <- i + 1 until p
    } yield corr(col(features(i)), col(features(j))).as(s"c_${i}_$j")
    val yAggs = features.zipWithIndex.map { case (f, i) => corr(col(f), col(outcome)).as(s"y_$i") }
    val all = pairAggs ++ yAggs
    val row = df.agg(all.head, all.tail: _*).head()
    val m = Array.fill(p, p)(1.0)
    var k = 0
    for (i <- 0 until p; j <- i + 1 until p) {
      val v = if (row.isNullAt(k)) 0.0 else row.getDouble(k)
      m(i)(j) = v; m(j)(i) = v; k += 1
    }
    val y = Array.tabulate(p)(i => if (row.isNullAt(k + i)) 0.0 else row.getDouble(k + i))
    (m, y)
  }

  /** CAR scores ω = R_X^{−1/2} ρ_{Xy} via driver-side symmetric eigensolve
    * of the (tiny, p×p) correlation matrix (care::carscore semantics,
    * step_select_carscore.R:133–140). `lambda` applies linear shrinkage
    * toward identity / zero: R' = (1−λ)R + λI, ρ' = (1−λ)ρ — the form of
    * care's James–Stein shrinkage with a caller-chosen intensity.
    */
  def carScores(df: DataFrame, features: Seq[String], outcome: String, lambda: Double = 0.0): Map[String, Double] = {
    if (features.isEmpty) return Map.empty
    val (m0, y0) = corrMatrix(df, features, outcome)
    val p = features.length
    val m = Array.tabulate(p, p)((i, j) =>
      if (i == j) 1.0 else (1 - lambda) * m0(i)(j))
    val y = y0.map(_ * (1 - lambda))
    val mat = new org.apache.commons.math3.linear.Array2DRowRealMatrix(m)
    val eig = new org.apache.commons.math3.linear.EigenDecomposition(mat)
    val v = eig.getV
    val invSqrtD = org.apache.commons.math3.linear.MatrixUtils.createRealDiagonalMatrix(
      (0 until p).map { i =>
        val ev = eig.getRealEigenvalue(i)
        if (ev > 1e-12) 1.0 / math.sqrt(ev) else 0.0
      }.toArray
    )
    val invSqrt = v.multiply(invSqrtD).multiply(v.transpose())
    val omega = invSqrt.operate(y)
    features.zipWithIndex.map { case (f, i) => f -> omega(i) }.toMap
  }
}
