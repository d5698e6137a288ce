package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Test-only NAIVE rank formulation: mid-ranks via a global (no-partition)
  * rank() window per column — the direct-but-unscalable reference that the
  * production paths (Correlation.spearman's distinct-value rank table,
  * Binning.ntileBins) are asserted exactly equal to. Lives in test sources
  * on purpose: src/main must not contain single-partition row sorts
  * (PlanSpec's global-window guard).
  */
object TestRankRef {

  /** Mid-ranks (average rank for ties) of each column, appended as
    * `<col>__rank`. NULLs keep NULL ranks. rank + (ties−1)/2 where ties is
    * the tie-group size = R's rank(ties.method = "average"). */
  def midRanks(df: DataFrame, cols: Seq[String], suffix: String = "__rank"): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      val w = Window.orderBy(col(c))
      val tie = Window.partitionBy(col(c))
      d.withColumn(
        c + suffix,
        when(col(c).isNull, lit(null))
          .otherwise(rank().over(w) + (count(lit(1)).over(tie) - 1) / 2.0)
      )
    }
}
