package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.stats.{Binning, Correlation}

/** The scalable (no global row sort) rank formulations must EXACTLY equal
  * the direct window formulations they replace. */
class ScalableRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scalable ntileBins == SQL NTILE over the same ordering (ties, rem buckets)") {
    val rng = new scala.util.Random(11)
    // heavy ties + a row count not divisible by nbins
    val rows = (0 until 997).map(i => ("f" + (i % 2), rng.nextInt(20).toDouble, i.toLong))
    val long = rows.toDF("feature", "value", "id")
    for (nbins <- Seq(3, 5, 7)) {
      val fast = Binning.ntileBins(long, nbins, col("id"))
        .select("feature", "id", "bin").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
      val w = Window.partitionBy("feature").orderBy(col("value"), col("id"))
      val ref = long.withColumn("bin", ntile(nbins).over(w))
        .select("feature", "id", "bin").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
      assert(fast == ref, s"nbins=$nbins")
    }
  }

  test("scalable ntileBins propagates nulls") {
    val long = Seq(("f", Some(1.0), 1L), ("f", None, 2L), ("f", Some(2.0), 3L))
      .toDF("feature", "value", "id")
    val got = Binning.ntileBins(long, 2, col("id")).select("id", "bin").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(got(2L).isEmpty && got(1L).contains(1) && got(3L).contains(2))
  }

  test("DoubleBits.monotone preserves Spark's ascending double order (NaN last, signs, subnormals)") {
    val vals = Seq(
      Double.NegativeInfinity, -1.7e308, -123.456, -1.0, -Double.MinPositiveValue,
      0.0, Double.MinPositiveValue, 1e-300, 0.5, 1.0, 123.456, 1.7e308,
      Double.PositiveInfinity, Double.NaN)
    // pairwise: m(a) < m(b) iff a sorts before b (java.lang.Double.compare
    // == Spark's ascending null-free double ordering)
    for (a <- vals; b <- vals) {
      val cmp = java.lang.Double.compare(a, b)
      val m = java.lang.Long.compare(
        graft.functions.DoubleBits.monotone(a), graft.functions.DoubleBits.monotone(b))
      assert(Integer.signum(m) == Integer.signum(cmp), s"order($a, $b)")
    }
    // bucket is non-decreasing in the same order, and the codegen path
    // agrees with the static helper
    val df = vals.filterNot(_.isNaN).toDF("v").select(col("v").cast("double").as("v"))
    val got = df.select(col("v"), graft.functions.DoubleBits.of(col("v")).as("m")).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    vals.filterNot(_.isNaN).foreach { v =>
      assert(got(v) == graft.functions.DoubleBits.monotone(v), s"codegen($v)")
    }
  }

  test("scalable spearman == midRanks-window spearman") {
    val rng = new scala.util.Random(12)
    val df = (0 until 500).map { _ =>
      val a = rng.nextInt(10).toDouble // heavy ties
      val b = rng.nextGaussian()       // continuous
      (a, b, a * 2 + b + rng.nextGaussian())
    }.toDF("a", "b", "y")
    val fast = Correlation.spearman(df, Seq("a", "b"), "y")
    val cols = Seq("a", "b", "y")
    val ranked = TestRankRef.midRanks(df, cols)
    val ref = Correlation.pearson(
      ranked.select(cols.map(c => col(c + "__rank").as(c)): _*), Seq("a", "b"), "y")
    Seq("a", "b").foreach { f =>
      assert(math.abs(fast(f).get - ref(f).get) < 1e-12, f)
    }
  }
}
