package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native membership test against a pre-built [[BloomFilter]] — the
  * map-side gate of a broadcast-Bloom semi-join.
  *
  * Why it exists: when the membership set is too large to ride a broadcast
  * hash join (every benchmark suite's n-grams at once, a multi-billion-key
  * blocklist), an exact membership join must shuffle the FULL probe side —
  * at 100 TB that shuffle, not the join itself, is the cost. A Bloom filter
  * compresses the membership set ~40× versus a string hash map (~10 bits
  * per key at 1% fpp), small enough to ship inside the task closure, and
  * this expression evaluates it inside whole-stage codegen BEFORE any
  * exchange — so only true hits plus an fpp sliver of false positives ever
  * reach the exact verify join. No false negatives, so exact-verifying the
  * survivors reproduces the un-filtered result bit-for-bit.
  *
  * Hash contract: `mightContainBinary(utf8.getBytes)` — byte-identical to
  * how Spark's own `Dataset.stat.bloomFilter` populates the sketch for
  * string columns (BloomFilterAggregate's BinaryUpdater does
  * `UTF8String.getBytes → putBinary`), so a filter built by the distributed
  * public aggregate is directly consumable here. Null → null.
  *
  * The filter object is Serializable (BloomFilterImpl) and rides the task
  * closure once per task, referenced from generated code via
  * `addReferenceObj` — no per-row deserialization, no UDF.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"bloom_might_contain expects string, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType

  override def nullSafeEval(v: Any): Any =
    filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainBinary($c.getBytes());")
  }

  // the sketch has no structural equality — identity is what callers mean
  // (each build is its own filter); keeps Expression.equals cheap
  override def equals(other: Any): Boolean = other match {
    case BloomMightContain(c, f) => c == child && (f eq filter)
    case _                       => false
  }
  override def hashCode(): Int = child.hashCode()

  override def toString: String = s"bloom_might_contain($child)"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def mightContain(value: Column, filter: BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(value), filter))
}
