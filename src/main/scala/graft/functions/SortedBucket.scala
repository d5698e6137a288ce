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
