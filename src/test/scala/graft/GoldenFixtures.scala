package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.select._
import graft.stats.Entropy

/** Deterministic fixtures + the score matrix pinned by committed golden
  * JSONs (FIXTURES.md §2: "Golden JSON per fixture per method ... asserted
  * allclose (1e-6 rel) and by ranking"). The fixture rows are generated
  * from a fixed-seed java.util.Random (algorithm specified by the JDK spec,
  * stable across platforms), so the golden values are reproducible
  * anywhere. */
object GoldenFixtures {

  /** iris-like: 150 rows, 4 numeric predictors, 3-class outcome. */
  def irisLike(spark: SparkSession): DataFrame = {
    val rng = new java.util.Random(42)
    val rows = (0 until 150).map { i =>
      val cls = i % 3
      (cls * 1.5 + rng.nextGaussian(),
        cls * 0.5 + rng.nextGaussian() * 2,
        rng.nextGaussian(),
        (2 - cls) * 2.0 + rng.nextGaussian() * 0.5,
        s"c$cls")
    }
    spark.createDataFrame(rows).toDF("f1", "f2", "f3", "f4", "species")
  }

  /** biomass-like: 5 numeric predictors, numeric outcome (regression). */
  def biomassLike(spark: SparkSession): DataFrame = {
    val rng = new java.util.Random(43)
    val rows = (0 until 500).map { _ =>
      val a = rng.nextGaussian(); val b = rng.nextGaussian(); val c = rng.nextGaussian()
      val d = rng.nextGaussian(); val e = rng.nextGaussian()
      (a, b, c, d, e, 3 * a - 2 * b + 0.5 * c + rng.nextGaussian() * 0.3)
    }
    spark.createDataFrame(rows).toDF("p1", "p2", "p3", "p4", "p5", "hhv")
  }

  val irisPreds = Seq("f1", "f2", "f3", "f4")
  val bioPreds = Seq("p1", "p2", "p3", "p4", "p5")

  /** method name -> fitted selector, over the two fixtures. */
  def all(spark: SparkSession): Seq[(String, FittedSelector)] = {
    val iris = irisLike(spark).cache()
    val bio = biomassLike(spark).cache()
    try {
      Seq(
        "infogain_classif" ->
          InfoGainStep(topP = Some(2)).fit(iris, "species", irisPreds),
        "gainratio_classif" ->
          InfoGainStep(topP = Some(2), kind = Entropy.GainRatio).fit(iris, "species", irisPreds),
        "symuncert_classif" ->
          InfoGainStep(topP = Some(2), kind = Entropy.SymUncert).fit(iris, "species", irisPreds),
        "infogain_regression" ->
          InfoGainStep(topP = Some(3)).fit(bio, "hhv", bioPreds),
        "mrmr_classif" ->
          MrmrStep(topP = Some(2)).fit(iris, "species", irisPreds),
        "roc_multiclass" ->
          RocStep(topP = Some(2)).fit(iris, "species", irisPreds),
        "pearson_regression" ->
          CorrStep(topP = Some(2), method = "pearson").fit(bio, "hhv", bioPreds),
        "spearman_regression" ->
          CorrStep(topP = Some(2), method = "spearman").fit(bio, "hhv", bioPreds),
        "car_regression" ->
          CorrStep(topP = Some(2), method = "car").fit(bio, "hhv", bioPreds),
        "fcbf_classif" ->
          FcbfStep(minimumSu = 0.025).fit(iris, "species", irisPreds),
        "linear_regression" ->
          LinearStep(topP = Some(3)).fit(bio, "hhv", bioPreds),
        "aov_regression" -> {
          val cat = bio
            .withColumn("g1", when(col("p1") > 0, "hi").otherwise("lo"))
            .withColumn("g2", when(col("p2") > 0.5, "a").when(col("p2") > -0.5, "b").otherwise("c"))
          AovStep(topP = Some(1)).fit(cat, "hhv", Seq("g1", "g2"))
        },
        "xtab_classif" -> {
          val cat = iris
            .withColumn("x1", when(col("f1") > 1.5, "hi").otherwise("lo"))
            .withColumn("x2", when(col("f3") > 0, "a").otherwise("b"))
          XtabStep(topP = Some(1)).fit(cat, "species", Seq("x1", "x2"))
        },
        "relief_classif" ->
          ReliefStep(topP = Some(2), sampleSize = 20).fit(iris, "species", irisPreds),
        "relief_regression" ->
          ReliefStep(topP = Some(2), sampleSize = 20).fit(bio, "hhv", bioPreds)
      )
    } finally { iris.unpersist(); bio.unpersist() }
  }

  def toJson(entries: Seq[(String, FittedSelector)]): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    entries.map { case (m, f) =>
      val scores = f.scores.map {
        case (k, Some(v)) => s""""${esc(k)}":$v"""
        case (k, None)    => s""""${esc(k)}":null"""
      }.mkString("{", ",", "}")
      val excluded = f.excluded.map(e => s""""${esc(e)}"""").mkString("[", ",", "]")
      s""""$m":{"scores":$scores,"excluded":$excluded}"""
    }.mkString("{\n", ",\n", "\n}")
  }
}

/** One-shot generator: sbt "Test/runMain graft.GoldenGen" writes the golden
  * file that GoldenSpec then pins. Regenerate ONLY on a deliberate,
  * documented semantic change. */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val json = GoldenFixtures.toJson(GoldenFixtures.all(spark))
    val path = java.nio.file.Paths.get("src/test/resources/golden_scores.json")
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, json)
    println(s"wrote $path")
    spark.stop()
  }
}
