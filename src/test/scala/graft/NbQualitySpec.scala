package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.BucketWeightSum
import graft.text.NbQuality

/** Hashed-bag Naive Bayes quality filter: exact local replay, parallelism
  * invariance, null/empty/contract semantics, and the fused
  * BucketWeightSum scoring kernel. */
class NbQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // a corpus where class-separating tokens exist but both classes share
  // vocabulary too (so weights are non-trivial in both directions)
  val corpus: Seq[(Long, String, Boolean)] = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", true),
    (1L, "a clear well written paragraph about science", true),
    (2L, "the science of language models is well studied", true),
    (3L, "buy cheap pills now click here cheap cheap", false),
    (4L, "click click spam spam buy now", false),
    (5L, "the spam about pills is cheap", false),
    (6L, "  leading and trailing   whitespace\ttabs too  ", true),
    (7L, "", false)) // empty text still tokenizes to one empty token

  val B = 64
  val alpha = 1.0

  /** Local replay of fit + score: same tokenization (trim + \s+ split),
    * same md5-48, same bucketing, same add-alpha log-odds, ascending sum. */
  private def local(): (Map[Long, Double], Array[Double], Double) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h48(tok: String): Long = {
      val d = md.digest(tok.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
        ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
    }
    def toks(t: String): Seq[Int] =
      t.trim.split("\\s+", -1).toSeq.map(w => (h48(w) % B).toInt)
    val cp = new Array[Long](B); val cn = new Array[Long](B)
    corpus.foreach { case (_, t, pos) =>
      toks(t).foreach(b => if (pos) cp(b) += 1 else cn(b) += 1)
    }
    val pt = cp.sum; val nt = cn.sum
    val pd = corpus.count(_._3).toLong; val nd = corpus.size - pd
    val w = Array.tabulate(B)(b =>
      math.log((cp(b) + alpha) / (pt + alpha * B)) - math.log((cn(b) + alpha) / (nt + alpha * B)))
    val bias = math.log(pd.toDouble / nd)
    val scores = corpus.map { case (id, t, _) =>
      var s = bias
      toks(t).foreach(b => s += w(b))
      id -> s
    }.toMap
    (scores, w, bias)
  }

  test("fit + score == local integer-count replay bit-for-bit; parallelism-invariant") {
    val (want, wantW, wantBias) = local()
    def run(parts: Int): (NbQuality.Model, Map[Long, Double]) = {
      val df = corpus.toDF("id", "text", "pos").repartition(parts)
      val m = NbQuality.fit(df, "text", col("pos"), buckets = B, alpha = alpha)
      val s = NbQuality.score(df, "id", "text", m)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      (m, s)
    }
    val (m1, s1) = run(1)
    val (m7, s7) = run(7)
    assert(m1.weights.toSeq == m7.weights.toSeq && m1.bias == m7.bias,
      "model must be bit-identical at any parallelism (exact integer counts)")
    assert(s1 == s7, "scores must be bit-identical at any parallelism")
    assert(m1.weights.toSeq == wantW.toSeq, "weights == local replay")
    assert(m1.bias == wantBias)
    assert(s1 == want, s"got $s1, expected $want")
    // the model separates the classes it was trained on
    val posMin = corpus.filter(c => c._3 && c._2.nonEmpty).map(c => s1(c._1)).min
    val negMax = corpus.filter(c => !c._3 && c._2.nonEmpty).map(c => s1(c._1)).max
    assert(posMin > negMax, s"posMin=$posMin negMax=$negMax")
  }

  test("null text scores null; token counts exclude null-text docs; null label = negative") {
    val df = Seq(
      (0L, "good doc words", java.lang.Boolean.TRUE),
      (1L, null.asInstanceOf[String], java.lang.Boolean.TRUE), // no tokens
      (2L, "bad doc words", java.lang.Boolean.FALSE),
      (3L, "unlabeled doc", null.asInstanceOf[java.lang.Boolean])
    ).toDF("id", "text", "pos")
    val m = NbQuality.fit(df, "text", col("pos"), buckets = 32)
    // null label counted negative, null text contributes no tokens:
    // positives = {0}: 3 tokens; negatives = {2, 3}: 3 + 2 tokens
    assert(m.posTokens == 3 && m.negTokens == 5, s"${m.posTokens}/${m.negTokens}")
    assert(m.posDocs == 2 && m.negDocs == 2, "doc prior counts rows, not tokens")
    val got = NbQuality.score(df, "id", "text", m)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).isEmpty, "null text -> null score")
    assert(got(0L).isDefined && got(2L).isDefined)
  }

  test("contracts: single-class corpora and bad params abort") {
    val onlyPos = Seq((0L, "a b", true), (1L, "c d", true)).toDF("id", "text", "pos")
    intercept[IllegalArgumentException](NbQuality.fit(onlyPos, "text", col("pos")))
    val ok = Seq((0L, "a b", true), (1L, "c d", false)).toDF("id", "text", "pos")
    intercept[IllegalArgumentException](NbQuality.fit(ok, "text", col("pos"), buckets = 1))
    intercept[IllegalArgumentException](NbQuality.fit(ok, "text", col("pos"), alpha = 0.0))
  }

  test("label-flip antisymmetry: swapping classes negates weights and bias exactly") {
    val df = corpus.toDF("id", "text", "pos")
    val m = NbQuality.fit(df, "text", col("pos"), buckets = B, alpha = alpha)
    val flipped = NbQuality.fit(df, "text", !col("pos"), buckets = B, alpha = alpha)
    assert(flipped.bias == -m.bias)
    assert(flipped.weights.toSeq == m.weights.map(-_).toSeq,
      "w'(b) = -w(b): the same two logs, negated — bit-exact")
    assert(flipped.posTokens == m.negTokens && flipped.negTokens == m.posTokens)
  }

  test("score additivity: concatenated docs score as the sum of their token weights") {
    val df = corpus.toDF("id", "text", "pos")
    val m = NbQuality.fit(df, "text", col("pos"), buckets = B, alpha = alpha)
    val a = "the quick brown fox"; val b = "buy cheap pills now"
    val s = NbQuality.score(
      Seq((1L, a), (2L, b), (3L, s"$a $b")).toDF("id", "text"), "id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(s(3L) - (s(1L) + s(2L) - m.bias)) < 1e-9,
      "score(a ++ b) = score(a) + score(b) - bias (one bias, same token weights)")
  }

  test("BucketWeightSum kernel: ascending sum, floorMod bucketing, empty=0, null element poisons") {
    val w = Array(0.5, -1.25, 2.0, 0.125)
    val df = Seq(
      (0L, Some(Seq[Option[Long]](Some(0L), Some(5L), Some(-1L)))), // -1 floorMod 4 = 3
      (1L, Some(Seq[Option[Long]]())),
      (2L, None),
      (3L, Some(Seq[Option[Long]](Some(2L), None)))
    ).toDF("id", "hs").select(col("id"), col("hs").cast("array<long>").as("hs"))
    val got = df.select(col("id"), BucketWeightSum.bucketWeightSum(col("hs"), w).as("s"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(0L).contains(0.5 + -1.25 + 0.125))
    assert(got(1L).contains(0.0), "empty array sums to 0")
    assert(got(2L).isEmpty, "null array -> null")
    assert(got(3L).isEmpty, "null element poisons the sum")
  }
}
