package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native expression: index of a double value in a SORTED boundary array —
  * `upperBound(bounds, v)` = the count of boundaries ≤ v, by binary search
  * (deterministic on duplicate boundaries: always the index past the last
  * equal entry). The range-partitioner primitive of the two-phase
  * prefix-sum pattern for VALUE-ordered keys: a `when`-chain over ~1k
  * boundaries blows codegen into interpreted linear scans per row, and a
  * higher-order `filter` over a boundary array runs interpreted per
  * element (the round-3 HOF trap); this is one O(log B) codegen call.
  *
  * Null/NaN input → null (a partitioner has no bucket for them; callers
  * filter first). The boundary array rides along as a referenced object —
  * no per-row allocation.
  */
case class SortedBucket(child: Expression, bounds: Array[Double]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"sorted_bucket expects double, got ${child.dataType}")
    else if (bounds.isEmpty || bounds.exists(_.isNaN))
      TypeCheckResult.TypeCheckFailure("sorted_bucket expects non-empty, NaN-free boundaries")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val d = v.asInstanceOf[Double]
    if (d.isNaN) null else SortedBucket.upperBound(bounds, d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bounds", bounds, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |if (Double.isNaN($v)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.SortedBucket.upperBound($ref, $v);
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native expression: snap a value UP to the first cut ≥ it — exactly the
  * `element_at(array(cuts :+ MaxValue), binByCuts(v, cuts))` chain
  * ([[graft.stats.Binning.binByCuts]] semantics: values equal to a cut go
  * low, i.e. snap to themselves; above every cut → Double.MaxValue; NaN →
  * Double.MaxValue, matching the when-chain where NaN fails every `<=`;
  * null → null), but in one O(log B) binary search. The chain builds a
  * cuts-deep nested CaseWhen PLUS a cuts-wide CreateArray — at the MDL
  * quantizer's 65k candidates that expression tree overflows the driver
  * stack in Catalyst's transforms before codegen even gets to reject it.
  */
case class SnapUp(child: Expression, cuts: Array[Double]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"snap_up expects double, got ${child.dataType}")
    else if (cuts.exists(_.isNaN))
      TypeCheckResult.TypeCheckFailure("snap_up expects NaN-free cuts")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any): Any =
    SnapUp.snap(cuts, v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cuts", cuts, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SnapUp.snap($ref, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SnapUp {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** First cut ≥ v, else Double.MaxValue (NaN → MaxValue too). */
  def snap(cuts: Array[Double], v: Double): Double = {
    if (v.isNaN) return Double.MaxValue
    // lower bound: first index with cuts(i) >= v
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) < v) lo = mid + 1 else hi = mid
    }
    if (lo < cuts.length) cuts(lo) else Double.MaxValue
  }

  def of(v: Column, cuts: Array[Double]): Column =
    ColumnBridge.column(SnapUp(ColumnBridge.expression(v.cast("double")), cuts))
}

object SortedBucket {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** First index i with bounds(i) > v (== count of boundaries ≤ v). */
  def upperBound(bounds: Array[Double], v: Double): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Column API: bucket index of `v` in the sorted `bounds`. */
  def of(v: Column, bounds: Array[Double]): Column =
    ColumnBridge.column(SortedBucket(ColumnBridge.expression(v.cast("double")), bounds))
}
