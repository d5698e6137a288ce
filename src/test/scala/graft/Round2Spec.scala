package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.select.{CorrStep, SelectorPipeline, SelectorStep, VipStep, ImportanceExtractor}
import graft.sim.Similarity
import graft.stats.{Binning, ChiSq}
import graft.text.{Dedup, TextFeatures}

/** Round-2 additions: Fisher r×c, per-column NA quantiles, multi-probe LSH,
  * IVF search, GBT importances, portable (md5) dedup variants, checkpointed
  * pipeline parity. */
class Round2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- Fisher exact r×c ---------------------------------------------------

  /** Independent slow oracle: exact-rational enumeration of every table with
    * the given margins; p = Σ P(T) for P(T) <= P(obs)·(1+1e-7), with P as a
    * BigDecimal ratio of factorials (no logs, no floats in the compare). */
  private def fisherSlow(obs: Array[Array[Long]]): Double = {
    val r = obs.length; val c = obs(0).length
    val rs = obs.map(_.sum); val cs = (0 until c).map(j => obs.map(_(j)).sum)
    val n = rs.sum
    def fact(x: Long): BigInt = (1L to x).foldLeft(BigInt(1))(_ * _)
    val numer = rs.map(fact).product * cs.map(fact).product
    def prob(t: Array[Array[Long]]): BigDecimal =
      BigDecimal(numer) / BigDecimal(fact(n) * t.flatten.map(fact).product)
    // enumerate all tables by filling free cells, last row/col forced
    var tables = List.empty[Array[Array[Long]]]
    val cur = Array.ofDim[Long](r, c)
    def go(i: Int, j: Int): Unit = {
      if (i == r - 1) {
        for (j2 <- 0 until c) cur(r - 1)(j2) = cs(j2) - (0 until r - 1).map(cur(_)(j2)).sum
        if (cur(r - 1).forall(_ >= 0) && cur(r - 1).sum == rs(r - 1))
          tables ::= cur.map(_.clone())
      } else if (j == c - 1) {
        cur(i)(j) = rs(i) - (0 until c - 1).map(cur(i)(_)).sum
        if (cur(i)(j) >= 0) go(i + 1, 0)
      } else {
        for (v <- 0L to rs(i)) { cur(i)(j) = v; go(i, j + 1) }
      }
    }
    go(0, 0)
    val pObs = prob(obs)
    val cut = pObs * BigDecimal(1 + 1e-7)
    tables.filter(t => prob(t) <= cut).map(prob).sum.toDouble min 1.0
  }

  test("fisher r×c matches independent exact-rational enumeration") {
    val t23 = Array(Array(2L, 3L, 1L), Array(4L, 1L, 5L))
    val got = ChiSq.fisherExactRxC(t23).get
    assert(math.abs(got - fisherSlow(t23)) < 1e-10, s"2x3: $got")
    val t33 = Array(Array(1L, 2L, 0L), Array(3L, 1L, 2L), Array(0L, 2L, 4L))
    val got33 = ChiSq.fisherExactRxC(t33).get
    assert(math.abs(got33 - fisherSlow(t33)) < 1e-10, s"3x3: $got33")
  }

  test("fisher r×c reduces to the R-pinned 2×2 path and is transpose-invariant") {
    val t = Array(Array(3L, 1L), Array(1L, 3L))
    assert(ChiSq.fisherExactRxC(t).get == ChiSq.fisherExact2x2(3, 1, 1, 3))
    val t23 = Array(Array(2L, 3L, 1L), Array(4L, 1L, 5L))
    val tT = Array(Array(2L, 4L), Array(3L, 1L), Array(1L, 5L))
    assert(math.abs(ChiSq.fisherExactRxC(t23).get - ChiSq.fisherExactRxC(tT).get) < 1e-12)
  }

  test("XtabStep fisher mode scores r×c (3-level × 3-class) factors end-to-end") {
    // the reference calls stats::fisher.test on ANY table
    // (step_select_xtab.R:96) — pre-round-2 the engine returned None for
    // tables beyond 2×2; now both features get exact p-scores
    val iris = GoldenFixtures.irisLike(spark)
    val cat = iris
      .withColumn("x3lvl", when(col("f1") > 1.5, "hi").when(col("f1") > 0, "mid").otherwise("lo"))
      .withColumn("x2lvl", when(col("f3") > 0, "a").otherwise("b"))
    val fitted = graft.select.XtabStep(topP = Some(1), fisher = true, fdr = false)
      .fit(cat, "species", Seq("x3lvl", "x2lvl"))
    val scores = fitted.scores.toMap
    assert(scores("x3lvl").isDefined, "3x3 Fisher must produce a p, not None")
    assert(scores("x2lvl").isDefined)
    assert(scores.values.flatten.forall(p => p >= 0 && p <= 1))
    // x3lvl is derived from the informative f1 -> far smaller p than the 2-level split of noisy f3
    assert(scores("x3lvl").get < scores("x2lvl").get)
  }

  test("fisher r×c enumeration budget exceeded returns None, not a wrong p") {
    val big = Array(Array(500L, 600L, 700L), Array(800L, 900L, 1000L), Array(400L, 300L, 200L))
    assert(ChiSq.fisherExactRxC(big, budget = 1000L).isEmpty)
  }

  // ---- per-column NA quantiles ---------------------------------------------

  test("exactCuts removes NAs per column, not listwise") {
    // a is null exactly where b has its upper half: listwise deletion would
    // shift b's cuts; per-column must not
    val rows = (1 to 100).map { i =>
      (if (i > 50) None else Some(i.toDouble), i.toDouble)
    }
    val df = rows.toDF("a", "b")
    val cuts = Binning.exactCuts(df, Seq("a", "b"), 2)
    val bAlone = Binning.exactCuts(df.select("b"), Seq("b"), 2)
    assert(cuts("b").toSeq == bAlone("b").toSeq, "b's cuts must ignore a's nulls")
    val aAlone = Binning.exactCuts(df.where(col("a").isNotNull).select("a"), Seq("a"), 2)
    assert(cuts("a").toSeq == aAlone("a").toSeq)
  }

  // ---- similarity search ----------------------------------------------------

  val rng = new scala.util.Random(7)
  lazy val vecs = (0 until 200).map(i => (i.toLong, Array.fill(32)(rng.nextFloat())))
  lazy val vdf = { val d = vecs.toDF("id", "v"); d.cache(); d.count(); d }
  lazy val query: Seq[Double] = vecs.head._2.map(_.toDouble).toSeq

  test("multi-probe LSH returns k rows and recall >= single-probe") {
    val planes = Similarity.hyperplanes(6, 32)
    val brute = Similarity.bruteForceTopK(vdf, "id", "v", query, 10)
      .collect().map(_.getLong(0)).toSet
    val single = Similarity.lshTopK(vdf, "id", "v", query, 10, planes, probeHamming = 0)
      .collect().map(_.getLong(0)).toSet
    val multi = Similarity.lshTopK(vdf, "id", "v", query, 10, planes, probeHamming = 2)
      .collect().map(_.getLong(0)).toSet
    assert(multi.size == 10, s"multi-probe must fill k, got ${multi.size}")
    assert((multi & brute).size >= (single & brute).size, "probing must not lose recall")
    assert(multi.contains(0L))
  }

  test("probeBuckets enumerates exactly the Hamming ball") {
    val got = Similarity.probeBuckets(5L, 4, 2).toSet
    val want = (0 until 16).map(_.toLong).filter(b => java.lang.Long.bitCount(b ^ 5L) <= 2).toSet
    assert(got == want)
    assert(Similarity.probeBuckets(5L, 4, 2).size == got.size, "no duplicates")
  }

  test("ivfTopK with nprobe = all cells equals brute-force top-k") {
    val centroids = vecs.take(4).map(_._2.map(_.toDouble).toSeq)
    val ivf = Similarity.ivfTopK(vdf, "id", "v", query, 10, centroids, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = Similarity.bruteForceTopK(vdf, "id", "v", query, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf == brute)
  }

  test("seedCentroids: deterministic across parallelism, k distinct vectors") {
    val c1 = Similarity.seedCentroids(vdf, "id", "v", 4)
    val c2 = Similarity.seedCentroids(vdf.repartition(7), "id", "v", 4)
    assert(c1 == c2, "hash-random sample must not depend on partitioning")
    assert(c1.size == 4 && c1.distinct.size == 4)
    val ivf = Similarity.ivfTopK(vdf, "id", "v", query, 5, c1, nprobe = 4)
    assert(ivf.collect().length == 5)
  }

  test("ivfTopK probes nearest cells first: planted duplicate always found") {
    val planted = vdf.unionByName(Seq((9999L, vecs.head._2.map(x => x * 3.0f))).toDF("id", "v"))
    val centroids = vecs.take(4).map(_._2.map(_.toDouble).toSeq)
    val got = Similarity.ivfTopK(planted, "id", "v", query, 2, centroids, nprobe = 1)
      .collect().map(_.getLong(0)).toSet
    // the scaled copy has cosine 1.0 to the query and lands in the query's cell
    assert(got == Set(0L, 9999L))
  }

  // ---- GBT importances through VipStep -------------------------------------

  test("VipStep with GBT regressor ranks informative feature over noise") {
    val r2 = new scala.util.Random(11)
    val df = (0 until 400).map { _ =>
      val a = r2.nextGaussian(); val b = r2.nextGaussian()
      (a, b, 3 * a + r2.nextGaussian() * 0.1)
    }.toDF("inf", "noise", "y")
    val imp = (d: org.apache.spark.sql.DataFrame, y: String, ps: Seq[String]) => {
      val assembled = new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(ps.toArray).setOutputCol("__features").setHandleInvalid("skip").transform(d)
      val m = new org.apache.spark.ml.regression.GBTRegressor()
        .setFeaturesCol("__features").setLabelCol(y).setMaxIter(5).setMaxDepth(3).setSeed(1L)
        .fit(assembled)
      implicitly[ImportanceExtractor[org.apache.spark.ml.regression.GBTRegressionModel]]
        .importances(m, ps)
    }
    val fitted = VipStep(imp, topP = Some(1)).fit(df, "y", Seq("inf", "noise"))
    val scores = fitted.scores.toMap
    assert(scores("inf").get > scores("noise").get)
    assert(fitted.excluded == Seq("noise"))
    assert(scores("inf").get == 100.0, "rescaled 0-100")
  }

  test("generic importance extractor probes featureImportances then coefficients, aborts otherwise") {
    val r4 = new scala.util.Random(17)
    val df = (0 until 200).map { _ =>
      val a = r4.nextGaussian(); val b = r4.nextGaussian()
      (a, b, 2 * a + r4.nextGaussian() * 0.1)
    }.toDF("a", "b", "y")
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("a", "b")).setOutputCol("__features").transform(df)
    val rf = new org.apache.spark.ml.regression.RandomForestRegressor()
      .setFeaturesCol("__features").setLabelCol("y").setNumTrees(5).setSeed(1L).fit(assembled)
    val viaGeneric = ImportanceExtractor.generic(rf, Seq("a", "b"))
    val viaInstance = implicitly[ImportanceExtractor[
      org.apache.spark.ml.regression.RandomForestRegressionModel]].importances(rf, Seq("a", "b"))
    assert(viaGeneric == viaInstance)
    val lr = new org.apache.spark.ml.regression.LinearRegression()
      .setFeaturesCol("__features").setLabelCol("y").fit(assembled)
    assert(ImportanceExtractor.generic(lr, Seq("a", "b")).keySet == Set("a", "b"))
    val err = intercept[IllegalArgumentException](ImportanceExtractor.generic("not a model", Seq("a")))
    assert(err.getMessage.contains("No method for pulling feature importances"))
  }

  // ---- portable (md5) dedup variants ----------------------------------------

  lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup
    (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near dup
    (3L, "entirely different words compose this sentence about nothing at all here"),
    (4L, "stars collapse under gravity forming dense remnants that light cannot escape")
  ).toDF("doc_id", "text")

  test("nearDuplicates(32 sigs, 16 bands) finds planted exact+near pairs, skips distinct") {
    val got = Dedup.nearDuplicates(docs, "doc_id", "text", n = 3, minJaccard = 0.8,
      signatures = 32, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 1L)), "exact duplicate pair")
    assert(got.contains((0L, 2L)) && got.contains((1L, 2L)), "near-duplicate pairs (j ≈ 0.83)")
    assert(!got.exists { case (a, b) => a >= 3L || b >= 3L }, "distinct docs produce no pairs")
  }

  test("shingle-less docs are dropped from minhash signatures (no null-signature clique)") {
    // docs under n tokens produce an empty shingle array: array_min = null,
    // so they would all share identical null-band buckets and form an
    // O(m²) candidate clique in the banding join
    val short = Seq(
      (100L, "one two"), (101L, "x"), (102L, ""),
      (103L, "three words here plus more")
    ).toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(short, "doc_id", "text", 3, 8)
      .collect().map(_.getLong(0)).toSet
    assert(sigs == Set(103L), s"only the shingle-bearing doc keeps a signature: $sigs")
    val cands = Dedup.minHashCandidates(
      Dedup.minHashSignatures(short, "doc_id", "text", 3, 8), "doc_id", 4, 2)
    assert(cands.count() == 0, "no spurious candidate pairs among shingle-less docs")
  }

  test("portable md5 minhash signatures: identical docs identical sigs, deterministic") {
    val sigs = Dedup.minHashSignaturesMd5(docs, "doc_id", "text", 3, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L) != sigs(3L))
    assert(sigs.values.flatten.forall(h => h >= 0 && h < (1L << 48)), "48-bit range")
    val again = Dedup.minHashSignaturesMd5(docs, "doc_id", "text", 3, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs == again)
  }

  test("portable 48-bit simhash: near-dups within small Hamming, in range") {
    val sh = Dedup.simHash48Md5(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh.values.forall(v => v >= 0 && v < (1L << 48)))
    assert(sh(0L) == sh(1L), "identical docs identical simhash")
    val hammingNear = java.lang.Long.bitCount(sh(0L) ^ sh(2L))
    val hammingFar = java.lang.Long.bitCount(sh(0L) ^ sh(4L))
    assert(hammingNear < hammingFar, s"near=$hammingNear far=$hammingFar")
  }

  test("portable rolling fingerprint: deterministic, order-sensitive, bounded") {
    val d = Seq((0L, "alpha beta gamma"), (1L, "gamma beta alpha"), (2L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val fp = d.select(col("doc_id"), TextFeatures.rollingFingerprintMd5(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(2L))
    assert(fp(0L) != fp(1L), "token order must matter")
    assert(fp.values.forall(v => v >= 0 && v < 1000000007L))
  }

  // ---- checkpointed pipeline parity -----------------------------------------

  test("checkpointed fitOrResume pipeline == direct SelectorPipeline, files written") {
    val r3 = new scala.util.Random(13)
    val df = (0 until 300).map { _ =>
      val a = r3.nextGaussian(); val b = r3.nextGaussian(); val c = r3.nextGaussian()
      (a, b, c, 2 * a + 0.3 * b + r3.nextGaussian() * 0.1)
    }.toDF("a", "b", "c", "y")
    val steps: Seq[(SelectorStep, Seq[String])] = Seq(
      (CorrStep(topP = Some(2), method = "pearson"), Seq("a", "b", "c")),
      (CorrStep(threshold = Some(0.5), method = "spearman"), Nil))
    val dir = java.nio.file.Files.createTempDirectory("graft-ck-spec").toString
    val ck = graft.runtime.Checkpoints.fitOrResume(spark, dir, steps, df, "y")
    val direct = SelectorPipeline(steps).fit(df, "y").steps
    assert(ck.map(_.excluded) == direct.map(_.excluded))
    assert(ck.map(_.scores) == direct.map(_.scores))
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).count()
    assert(files == 2, s"one checkpoint per step, got $files")
  }

  test("native WordShingles == built-in HOF chain, element-for-element (incl. order)") {
    import spark.implicits._
    // edge shapes: empty, whitespace-only, single word, n-1 words, unicode,
    // mixed case, tabs/newlines/multi-space runs, repeated grams
    val texts = Seq(
      "", " ", "solo", "two words", "a b c d e f",
      "The  QUICK\tbrown\nfox  the quick brown fox",
      "x x x x x", "Ünïcodé ÆØÅ ünïcodé æøå Ünïcodé",
      "a, b. c! a, b. c!", "  leading and trailing  "
    ) ++ (0 until 50).map { i =>
      val r = new scala.util.Random(i)
      (0 until r.nextInt(30)).map(_ => s"w${r.nextInt(8)}").mkString(" ")
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val native = df.select($"id", graft.text.Dedup.shingles($"text", n).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val builtin = df.select($"id", graft.text.Dedup.shinglesBuiltin($"text", n).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(native == builtin, s"n=$n mismatch: " +
        native.keys.filter(k => native(k) != builtin(k)).take(3)
          .map(k => s"id=$k native=${native(k)} builtin=${builtin(k)}").mkString("; "))
    }
    // null text propagates null, exactly like the built-in chain
    val withNull = spark.sql("SELECT CAST(NULL AS STRING) AS text")
    assert(withNull.select(graft.text.Dedup.shingles(col("text"), 3)).collect()(0).isNullAt(0))
    assert(withNull.select(graft.text.Dedup.shinglesBuiltin(col("text"), 3)).collect()(0).isNullAt(0))
  }

  test("native MinHashSignature == k-transform built-in chain, bit-for-bit") {
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      val r = new scala.util.Random(i)
      (i, (0 until 5 + r.nextInt(40)).map(_ => s"t${r.nextInt(12)}").mkString(" "))
    }.toDF("doc_id", "text")
    for (k <- Seq(1, 8, 32)) {
      val native = graft.text.Dedup.minHashSignatures(docs, "doc_id", "text", 3, k)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val builtin = graft.text.Dedup.minHashSignaturesBuiltin(docs, "doc_id", "text", 3, k)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(native == builtin, s"k=$k signature mismatch")
    }
  }
}
