package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Discretization strategies for numeric columns.
  *
  * The reference delegates to FSelectorRcpp/praznik internals
  * (/root/reference/R/step_select_infgain.R:140–150 `equal`, `nbins`;
  * README.md:27–35: continuous outcomes are equal-frequency binned, default
  * nbins = 5). We expose binning as an explicit strategy:
  *
  *  - [[ntileBins]]  — exact rank-based equal-frequency (SQL NTILE), used
  *    where oracle parity matters. Ties are broken by an explicit unique
  *    tiebreak column so the assignment is deterministic and identical across
  *    engines. NOTE: ntile is a single ordered partition per feature — fine
  *    for p small relative to cluster width (each feature sorts in parallel
  *    with the others), but a skew hazard at extreme scale.
  *  - [[cutpointBins]] — compute exact quantile cut points (one distributed
  *    pass, relativeError = 0), broadcast them, and bin by value comparison.
  *    Fully scalable: no global sort, pure map-side `when` chain. Rows tied
  *    at a cut point all land in the lower bin (deterministic).
  *  - [[medianSplit]] — the reference's FCBF discretize_var
  *    (/root/reference/R/step_select_fcbf.R:256–270): values <= type-7
  *    median → 'l', > median → 'h', NULL stays NULL
  *    (tests: /root/reference/tests/testthat/test_discretize_var.R:1–13).
  */
object Binning {

  /** Exact equal-frequency bin ids 1..nbins per feature over long form
    * (feature, value, ...). Null values get null bins. `tiebreak` must be a
    * unique-per-row column for deterministic tie assignment.
    *
    * Exactly SQL NTILE over (PARTITION BY feature ORDER BY value, tiebreak)
    * but WITHOUT the single-partition-per-feature row sort: the global rank
    * is decomposed into (rows before this value) — a window over the
    * per-value COUNTS table, |distinct values| rows — plus a row_number
    * within the (feature, value) tie group. NTILE's bucket arithmetic
    * (first n mod k buckets get one extra row) is then closed-form.
    */
  def ntileBins(long: DataFrame, nbins: Int, tiebreak: Column, outCol: String = "bin"): DataFrame = {
    val nn = long.where(col("value").isNotNull)
    val counts = nn.groupBy("feature", "value").agg(count(lit(1)).as("__cnt"))
    val wv = Window.partitionBy("feature").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wf = Window.partitionBy("feature")
    // __before and __n in ONE window pass over the counts table — a second
    // aggregation would re-execute the whole upstream scan (Catalyst does
    // not share re-referenced subtrees)
    val cumTable = counts.select(
      col("feature").as("__f"), col("value").as("__v"),
      coalesce(sum("__cnt").over(wv), lit(0L)).as("__before"),
      sum("__cnt").over(wf).as("__n"))
    val wt = Window.partitionBy(col("feature"), col("value")).orderBy(tiebreak)
    val ranked = nn
      .withColumn("__rnw", row_number().over(wt))
      .join(cumTable, col("feature") === col("__f") && col("value") === col("__v"))
      .withColumn("__rank", col("__before") + col("__rnw"))
    val size = floor(col("__n") / nbins)
    val rem = col("__n") % nbins
    val boundary = rem * (size + 1)
    val bucket = when(col("__rank") <= boundary, floor((col("__rank") - 1) / (size + 1)) + 1)
      .otherwise(rem + floor((col("__rank") - boundary - 1) / size) + 1)
    val withBin = ranked
      .withColumn(outCol, bucket.cast("int"))
      .drop("__f", "__v", "__before", "__n", "__rnw", "__rank")
    val nulls = long.where(col("value").isNull)
      .withColumn(outCol, lit(null).cast("int"))
    withBin.unionByName(nulls)
  }

  /** Exact quantile cut points for each column: nbins-1 interior cuts at
    * probabilities i/nbins. Uses approxQuantile with relativeError 0 (exact,
    * single distributed pass per call). NA handling is PER COLUMN — a null in
    * one column must not remove the row from another column's quantile
    * (R quantile(na.rm=TRUE) / FSelectorRcpp semantics); approxQuantile
    * already ignores nulls per column, so no row-level dropping happens.
    */
  def exactCuts(df: DataFrame, cols: Seq[String], nbins: Int): Map[String, Array[Double]] = {
    val probs = (1 until nbins).map(_.toDouble / nbins).toArray
    val res = df.stat.approxQuantile(cols.toArray, probs, 0.0)
    cols.zip(res).toMap
  }

  /** Bin a numeric column by broadcast cut points: bin i (1-based) iff
    * value <= cuts(i-1), else last bin. Values equal to a cut go low.
    */
  def binByCuts(c: Column, cuts: Array[Double]): Column = {
    val nbins = cuts.length + 1
    var expr: Column = lit(nbins)
    // build from the top down so the FIRST (lowest) matching cut wins
    for (i <- cuts.indices.reverse)
      expr = when(c <= cuts(i), lit(i + 1)).otherwise(expr)
    when(c.isNull, lit(null)).otherwise(expr)
  }

  /** Scalable equal-frequency-style binning of wide columns in place:
    * adds `<col>__bin` columns. One stats pass + one narrow map.
    */
  def cutpointBins(df: DataFrame, cols: Seq[String], nbins: Int, suffix: String = "__bin"): DataFrame = {
    val cuts = exactCuts(df, cols, nbins)
    cols.foldLeft(df) { (d, c) => d.withColumn(c + suffix, binByCuts(col(c), cuts(c))) }
  }

  /** R type-7 median of a column, computed exactly and distributedly. */
  def exactMedian(df: DataFrame, c: String): Double = {
    val r = df.select(expr(s"percentile(`$c`, 0.5)")).head()
    if (r.isNullAt(0)) Double.NaN else r.getDouble(0)
  }

  /** discretize_var: 'l' iff value <= cut, 'h' above, NULL stays. */
  def medianSplitCol(c: Column, median: Double): Column =
    when(c.isNull, lit(null: String))
      .otherwise(when(c <= median, lit("l")).otherwise(lit("h")))

  /** Quantile-split each numeric column to 'l'/'h' string columns in place:
    * the reference's discretize_var at an arbitrary `cutpoint` quantile
    * (step_select_fcbf.R:256–270 — `stats::quantile(x, cutpoint)` is R
    * type-7, which Spark's `percentile` matches exactly). Same rules as the
    * median case: values <= cut go 'l' (ties low), NULL stays NULL, NAs are
    * ignored when computing the cut. All cuts in ONE distributed pass;
    * all-NULL columns yield all-NULL output (null percentile).
    */
  def quantileSplit(df: DataFrame, cols: Seq[String], cutpoint: Double): DataFrame = {
    require(cutpoint > 0 && cutpoint < 1, s"cutpoint must be in (0, 1), got $cutpoint")
    if (cols.isEmpty) return df
    val cuts = df
      .select(cols.map(c => expr(s"percentile(`$c`, $cutpoint)").as(c)): _*)
      .head()
    cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      if (cuts.isNullAt(i)) d.withColumn(c, lit(null: String))
      else d.withColumn(c, medianSplitCol(col(c), cuts.getDouble(i)))
    }
  }

  /** Median-split each numeric column to 'l'/'h' string columns in place
    * (FCBF preprocessing at the default cutpoint = 0.5,
    * step_select_fcbf.R:256–270).
    */
  def medianSplit(df: DataFrame, cols: Seq[String]): DataFrame =
    quantileSplit(df, cols, 0.5)
}
