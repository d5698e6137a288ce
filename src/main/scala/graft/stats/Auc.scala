package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ROC AUC per numeric feature vs a categorical outcome
  * (/root/reference/R/step_select_roc.R:87–108).
  *
  * AUC is the normalized Mann–Whitney U with MID-RANKS for ties:
  *   AUC = (R_pos − n_pos(n_pos+1)/2) / (n_pos · n_neg)
  * where R_pos is the rank-sum of positive-class values. The reference's
  * `direction = "auto"` makes the score effectively max(AUC, 1−AUC)
  * (step_select_roc.R:24, 91–93); >2 classes use Hand & Till 2001 — the mean
  * of pairwise binary AUCs (step_select_roc.R:94–96).
  *
  * Scale shape: ranks are NOT computed per row. We aggregate to per-
  * (feature, pair, value) counts first (map-side partial agg), then a window
  * over the distinct values per (feature, pair) produces mid-ranks — the
  * window input is |distinct values|, not |rows|.
  */
object Auc {

  /** long: (feature, value: double, y: string). Returns (feature, auc) with
    * direction-auto pairwise mean over the given class pairs. `handle` owns
    * the per-(feature, pair, value) counts cache the two-phase rank build
    * references twice (default arg = session-LRU lifetime, the registered-
    * query convention; callers that fit repeatedly pass one and release). */
  def scores(long: DataFrame, classPairs: Seq[(String, String)],
             handle: graft.runtime.CacheHandle = new graft.runtime.CacheHandle): DataFrame = {
    // aggregate to per-(feature, value, y) counts FIRST, then expand the
    // counts table by class pair: the per-row pair explode this replaces
    // multiplied the pre-aggregation row volume by |pairs| before any
    // map-side combining happened (and for a near-unique feature the
    // (feature, pair, value) key set is |pairs|× the (feature, value, y)
    // one). cnt/cntPos per (feature, pair, value) are the same integer
    // sums, associated differently — midranks and AUC are bit-identical.
    val byY = long
      .where(col("value").isNotNull && col("y").isNotNull)
      .groupBy("feature", "value", "y")
      .agg(count(lit(1)).as("c"))
    val pairStructs = classPairs.map { case (a, b) =>
      when(
        col("y") === a || col("y") === b,
        struct(lit(s"$a|$b").as("pair"), (col("y") === a).cast("long").as("isPos"))
      )
    }
    // CACHED: the two-phase rank build references this table twice (bases
    // aggregation + the per-value join) and Catalyst re-executes
    // re-referenced subtrees — unmaterialized, the whole melt + two
    // groupBys ran twice (measured: q_auc 1.7 -> 3.5 s). cache() rather
    // than a lazy localCheckpoint, also measured: the LogicalRDD leaf
    // loses the size estimate that keeps the bases join broadcast
    // (q_auc 1.9 -> 3.2 s on the checkpoint variant).
    val byValue = handle.track(byY
      .withColumn("tag", explode(array(pairStructs: _*)))
      .where(col("tag").isNotNull)
      .groupBy(col("feature"), col("tag.pair").as("pair"), col("value"))
      .agg(sum("c").as("cnt"), sum(col("tag.isPos") * col("c")).as("cntPos"))
      .cache())

    // TWO-PHASE midranks over the counts table (the spearman shape): a
    // near-unique feature otherwise cumulates its whole distinct-value set
    // through ONE window task per (feature, pair). The value's monotone
    // bit image yields range buckets for free; per-(feature, pair, bucket)
    // totals cumulate through a tiny window and the within-bucket prefix
    // windows run in parallel. Exact long sums — midranks bit-identical.
    val bucketed = byValue.withColumn("__bkt",
      graft.functions.DoubleBits.bucket(col("value"), 20))
    val wb = Window.partitionBy("feature", "pair").orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = bucketed.groupBy("feature", "pair", "__bkt").agg(sum("cnt").as("__bc"))
      .select(col("feature"), col("pair"), col("__bkt"),
        coalesce(sum("__bc").over(wb), lit(0L)).as("__base"))
    val wv = Window.partitionBy("feature", "pair", "__bkt").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = bucketed
      .join(bases, Seq("feature", "pair", "__bkt"))
      .withColumn(
        "midrank",
        col("__base") + coalesce(sum("cnt").over(wv), lit(0L)) + (col("cnt") + 1) / 2.0
      )

    ranked
      .groupBy("feature", "pair")
      .agg(
        sum(col("cntPos") * col("midrank")).as("rPos"),
        sum("cntPos").as("nPos"),
        (sum("cnt") - sum("cntPos")).as("nNeg")
      )
      .where(col("nPos") > 0 && col("nNeg") > 0)
      .withColumn(
        "auc",
        (col("rPos") - col("nPos") * (col("nPos") + 1) / 2.0) / (col("nPos") * col("nNeg"))
      )
      .withColumn("auc", greatest(col("auc"), lit(1.0) - col("auc"))) // direction auto
      .groupBy("feature")
      .agg(avg("auc").as("score"))
  }

  /** Convenience: derive the class pairs from the outcome's distinct values
    * (collected — class cardinality is small by construction). */
  def scoresAuto(long: DataFrame): DataFrame = scoresAuto(long, long.select("y"))

  /** [[scoresAuto]] with the class-discovery scan decoupled from the melted
    * table: `ySource` is any single-column frame holding the same outcome
    * values (callers pass the UN-MELTED outcome column, so the tiny
    * distinct doesn't re-execute the p-fold melt — measured ~0.5 s of the
    * q_auc bench time). The discovered class SET is identical because the
    * melt carries the outcome to every row unchanged. */
  def scoresAuto(long: DataFrame, ySource: DataFrame): DataFrame = {
    val classes = ySource.toDF("y")
      .select("y").where(col("y").isNotNull).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    require(classes.length >= 2, "ROC needs at least two outcome classes")
    val pairs = for { i <- classes.indices; j <- i + 1 until classes.length }
      yield (classes(i), classes(j))
    scores(long, pairs)
  }
}
