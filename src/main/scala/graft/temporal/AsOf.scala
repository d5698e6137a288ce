package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time-correct as-of join: for each probe row (key, probeTs)
  * attach the LATEST event row of the same key with eventTs <= probeTs
  * (strictly < when `strict`).
  *
  * The reference has no joins at all (colino is single-table — SURVEY §2.3);
  * this operator is mandated by the north_rule. Two physical strategies:
  *
  *  - [[sortMerge]] (default, scales to 10^12 rows): union-tag both sides,
  *    ONE shuffle on `key`, then a `last(_, ignoreNulls = true)` carry-forward
  *    window ordered by (ts, side). No row explosion, no range cross-product;
  *    cost is a single hash exchange + per-key sort — the same exchange also
  *    serves any downstream per-key window features, so callers should
  *    compute windowed features on the SAME partitioning before joining.
  *  - [[broadcastProbe]] for tiny probe sides: broadcast hash join on key
  *    with a ts-range predicate, then `max_by` per probe row. Avoids
  *    shuffling the big side entirely when the probe set fits in memory.
  *
  * Temporal-leakage guarantee: events sort BEFORE the probe at equal ts only
  * in the inclusive (<=) mode; nothing after probeTs is ever visible because
  * the window frame ends at the current row.
  *
  * Skew: hot keys are split by AQE for the shuffle; for pathological single
  * keys the caller can pre-aggregate events per (key, ts) first (dedup) —
  * see [[Windows.dedupLatest]].
  */
object AsOf {

  /** `tiebreak`: optional event-side column appended to the merge ordering —
    * among events sharing (key, ts), the one with the GREATEST tiebreak
    * value is carried (deterministic). Without it, ties are resolved by
    * upstream [[Windows.dedupLatest]] or are order-dependent. */
  def sortMerge(
      events: DataFrame,
      probes: DataFrame,
      key: String,
      eventTs: String,
      probeTs: String,
      eventCols: Seq[String],
      strict: Boolean = false,
      toleranceSeconds: Option[Long] = None,
      tiebreak: Option[String] = None
  ): DataFrame = {
    val probeCols = probes.columns.filterNot(c => c == key || c == probeTs).toSeq
    // side ordering implements the tie rule: inclusive => event (0) before
    // probe (1) at equal ts; strict => probe first so the event is invisible.
    val (eventSide, probeSide) = if (strict) (1, 0) else (0, 1)

    val e = events.select(
      Seq(col(key), col(eventTs).as("__ts"), lit(eventSide).as("__side"),
        col(eventTs).as("__ets"),
        tiebreak.map(col).getOrElse(lit(0L)).as("__tb")) ++
        eventCols.map(c => col(c).as(s"__e_$c")) ++
        probeCols.map(c => lit(null).cast(probes.schema(c).dataType).as(c)) :+
        lit(null).cast(probes.schema(probeTs).dataType).as(probeTs): _*
    )
    val p = probes.select(
      Seq(col(key), col(probeTs).as("__ts"), lit(probeSide).as("__side"),
        lit(null).cast(events.schema(eventTs).dataType).as("__ets"),
        tiebreak.map(c => lit(null).cast(events.schema(c).dataType))
          .getOrElse(lit(0L)).as("__tb")) ++
        eventCols.map(c => lit(null).cast(events.schema(c).dataType).as(s"__e_$c")) ++
        probeCols.map(col) :+
        col(probeTs): _*
    )
    // __tb sorts nulls (probe rows) FIRST within a tie group, so at equal
    // (ts, side=event) the greatest-tiebreak event is the last row the
    // carry-forward window sees; probe rows keep their side-relative order
    // because __side still precedes __tb.
    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = e.unionByName(p)
      .select(
        (Seq(col(key), col("__ts"), col("__side"), col(probeTs),
          last(col("__ets"), ignoreNulls = true).over(w).as("__last_ets")) ++
          probeCols.map(col) ++
          eventCols.map(c => last(col(s"__e_$c"), ignoreNulls = true).over(w).as(c))): _*
      )
    val probesOnly = carried.where(col("__side") === probeSide)
    // tolerance: a carried event older than the window is as good as absent
    val tooOld = toleranceSeconds.map { tol =>
      col("__last_ets").isNull ||
        unix_timestamp(col(probeTs)) - unix_timestamp(col("__last_ets")) > tol
    }
    val finalCols = Seq(col(key), col(probeTs)) ++ probeCols.map(col) ++
      eventCols.map { c =>
        tooOld match {
          case Some(cond) => when(cond, lit(null)).otherwise(col(c)).as(c)
          case None       => col(c)
        }
      }
    probesOnly.select(finalCols: _*)
  }

  /** Broadcast variant: probes must be small. Right join keeps probe rows
    * with no qualifying event (null event cols), matching sortMerge
    * semantics. Both sides are internally renamed so self-derived frames
    * (probes carved out of the events table) join without ambiguity. */
  def broadcastProbe(
      events: DataFrame,
      probes: DataFrame,
      key: String,
      eventTs: String,
      probeTs: String,
      eventCols: Seq[String],
      strict: Boolean = false,
      tiebreak: Option[String] = None
  ): DataFrame = {
    val probeCols = probes.columns.filterNot(c => c == key || c == probeTs).toSeq
    val e = events.select(
      col(key).as("__e_key") +: col(eventTs).as("__e_ts") +:
        tiebreak.map(col).getOrElse(lit(0L)).as("__e_tb") +:
        eventCols.map(c => col(c).as(s"__e_$c")): _*)
    // a unique per-probe-row id so duplicate (key, ts) probe rows each keep
    // their own output row, exactly like sortMerge (grouping on (key, ts)
    // alone collapsed them to one arbitrary row). monotonically_increasing_id
    // is only a disambiguator: it is unique within the one broadcast
    // materialization this plan evaluates, it is dropped before return, and
    // — unlike an all-columns ordering — it puts no orderability requirement
    // on probe payload types (maps etc.).
    val p = probes
      .withColumn("__p_id", monotonically_increasing_id())
      .select(col("__p_id") +: col(key).as("__p_key") +: col(probeTs).as("__p_ts") +:
        probeCols.map(c => col(c).as(s"__p_$c")): _*)
    val cond: Column =
      col("__e_key") === col("__p_key") &&
        (if (strict) col("__e_ts") < col("__p_ts") else col("__e_ts") <= col("__p_ts"))
    // max_by over (ts, tiebreak) mirrors sortMerge's greatest-tiebreak rule
    val aggs =
      probeCols.map(c => first(col(s"__p_$c")).as(c)) ++
        eventCols.map(c => max_by(col(s"__e_$c"), struct(col("__e_ts"), col("__e_tb"))).as(c))
    e.join(broadcast(p), cond, "right")
      .groupBy(col("__p_id"), col("__p_key").as(key), col("__p_ts").as(probeTs))
      .agg(aggs.head, aggs.tail: _*)
      .drop("__p_id")
  }
}
