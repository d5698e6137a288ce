package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ArrayMath
import graft.sim.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val rng = new scala.util.Random(5)
  lazy val vecs = (0 until 200).map { i =>
    (i.toLong, Array.fill(64)(rng.nextFloat()))
  }
  lazy val df = { val d = vecs.toDF("id", "v"); d.cache(); d.count(); d }
  lazy val query: Seq[Double] = vecs.head._2.map(_.toDouble).toSeq

  test("native cosine_sim expression == built-in zip_with/aggregate chain, bit-for-bit") {
    val builtin = Similarity.cosineBuiltin(col("v"), query)
    val native = ArrayMath.cosineSimTo(col("v"), query)
    val rows = df.select(col("id"), builtin.as("b"), native.as("n")).collect()
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"id=${r.getLong(0)}")
    }
  }

  test("native cosine_sim two-column variant and SQL registration") {
    ArrayMath.register(spark)
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql(
      "SELECT a.id, cosine_sim(a.v, b.v) c FROM vecs a JOIN vecs b ON b.id = 0")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaCol = df.select(col("id"), ArrayMath.cosineSimTo(col("v"), query).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql.keySet == viaCol.keySet)
    viaSql.foreach { case (k, v) => assert(math.abs(v - viaCol(k)) < 1e-12) }
    assert(math.abs(viaSql(0L) - 1.0) < 1e-12, "self-similarity = 1")
  }

  test("null array yields null; zero vector yields 0") {
    val d = Seq(
      (1L, Array(1.0f, 2.0f)), (2L, null.asInstanceOf[Array[Float]]), (3L, Array(0.0f, 0.0f))
    ).toDF("id", "v")
    val got = d.select(col("id"), ArrayMath.cosineSimTo(col("v"), Seq(1.0, 1.0)).as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(2L).isEmpty)
    assert(got(3L).contains(0.0))
    assert(got(1L).exists(v => math.abs(v - 3 / (math.sqrt(5) * math.sqrt(2))) < 1e-12))
  }

  test("brute-force top-k: query vector itself ranks first") {
    val top = Similarity.bruteForceTopK(df, "id", "v", query, 5).collect()
    assert(top.head.getLong(0) == 0L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
    // descending
    val cs = top.map(_.getDouble(1)).toSeq
    assert(cs == cs.sortBy(-(_: Double)))
  }

  test("LSH top-k returns a subset of brute-force ranking with the query's bucket") {
    val planes = Similarity.hyperplanes(4, 64)
    val lsh = Similarity.lshTopK(df, "id", "v", query, 5, planes).collect()
    assert(lsh.nonEmpty && lsh.head.getLong(0) == 0L, "query's own bucket contains itself")
    val bruteAll = Similarity.cosineToQuery(df, "v", query)
      .collect().map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("cosine"))).toMap
    lsh.foreach { r => assert(math.abs(r.getDouble(1) - bruteAll(r.getLong(0))) < 1e-6) }
  }

  test("IVF assignment puts each vector in its nearest centroid cell") {
    val centroids = vecs.take(3).map(_._2.map(_.toDouble).toSeq)
    val assigned = Similarity.ivfAssign(df, "v", centroids).collect()
    assigned.take(3).foreach { r =>
      // first three vectors ARE the centroids: each must land in its own cell
      val id = r.getLong(r.fieldIndex("id"))
      if (id < 3) assert(r.getInt(r.fieldIndex("cell")) == id.toInt)
    }
  }
}
