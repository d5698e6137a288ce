package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide → long reshape so ONE shuffle scores ALL features.
  *
  * The reference loops per column in R (purrr::map over predictors,
  * /root/reference/R/step_select_roc.R:127, step_select_xtab.R:123) — O(p)
  * passes over the data. At 10^12 rows that is unacceptable: we melt the
  * p predictor columns into a long (feature, value) form with
  * `explode(array(struct(...)))` — a narrow, codegen'd map — and aggregate by
  * (feature, ...) in one shuffle whose input is already partially aggregated
  * map-side.
  */
object Melt {

  /** Long form with a double-valued `value` column: one output row per input
    * row per feature. `keep` columns (e.g. the outcome) are carried along.
    *
    * NOT fanned out here (round-6 measurement): a blanket
    * `Partitions.fanOut` inside the melt re-priced every caller's every
    * action with the extra exchange — q_auc's class-discovery collect
    * alone regressed +0.6 s while the heavy callers moved within noise.
    * Callers whose post-melt work dominates fan out their INPUT instead.
    */
  def numeric(df: DataFrame, features: Seq[String], keep: Seq[String] = Nil): DataFrame = {
    val structs: Seq[Column] = features.map { f =>
      struct(lit(f).as("feature"), col(f).cast("double").as("value"))
    }
    df.select(keep.map(col) :+ explode(array(structs: _*)).as("fv"): _*)
      .select(keep.map(col) :+ col("fv.feature") :+ col("fv.value"): _*)
  }

  /** Long form with a string-valued `value` column (categorical predictors). */
  def categorical(df: DataFrame, features: Seq[String], keep: Seq[String] = Nil): DataFrame = {
    val structs: Seq[Column] = features.map { f =>
      struct(lit(f).as("feature"), col(f).cast("string").as("value"))
    }
    df.select(keep.map(col) :+ explode(array(structs: _*)).as("fv"): _*)
      .select(keep.map(col) :+ col("fv.feature") :+ col("fv.value"): _*)
  }
}
