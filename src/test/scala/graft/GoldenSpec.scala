package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins every scoring method against the committed golden file
  * (src/test/resources/golden_scores.json): allclose 1e-6 rel on scores,
  * exact on excluded sets. This is the cross-round regression gate — the
  * distributed implementation may be refactored freely; these numbers may
  * not move. */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val golden: Map[String, (Map[String, Option[Double]], Seq[String])] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden_scores.json"), "UTF-8")
    val json = try src.mkString finally src.close()
    // shape: {"method":{"scores":{...},"excluded":[...]},...}
    val methodRe = """"(\w+)":\{"scores":\{([^}]*)\},"excluded":\[([^\]]*)\]\}""".r
    methodRe.findAllMatchIn(json).map { m =>
      val scores = m.group(2).split(",").filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"") ->
          (if (v.trim == "null") None else Some(v.trim.toDouble))
      }.toMap
      val excluded = m.group(3).split(",").filter(_.nonEmpty)
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
      m.group(1) -> ((scores, excluded))
    }.toMap
  }

  lazy val current: Map[String, graft.select.FittedSelector] =
    GoldenFixtures.all(spark).toMap

  // Relief/model-based methods are seeded-deterministic within a JVM vendor
  // but MLlib tree/rng internals may shift across Spark versions — they get
  // ranking-level assertions; closed-form scores get allclose.
  val allclose = Seq(
    "infogain_classif", "gainratio_classif", "symuncert_classif",
    "infogain_regression", "mrmr_classif", "roc_multiclass",
    "pearson_regression", "spearman_regression", "car_regression",
    "fcbf_classif", "linear_regression", "aov_regression", "xtab_classif",
    "relief_classif", "relief_regression")

  test("golden file covers every method") {
    assert(golden.keySet == current.keySet,
      s"missing: ${current.keySet.diff(golden.keySet)}; stale: ${golden.keySet.diff(current.keySet)}")
  }

  allclose.foreach { method =>
    test(s"$method matches golden scores (1e-6 rel) and excluded set") {
      val (wantScores, wantExcl) = golden(method)
      val got = current(method)
      assert(got.excluded.toSet == wantExcl.toSet, s"excluded set for $method")
      got.scores.foreach { case (f, s) =>
        (s, wantScores(f)) match {
          case (Some(a), Some(b)) =>
            // exact match handles ±Infinity (e.g. aov −log10(p) at p = 0,
            // matching R's -log10(0) = Inf)
            assert(a == b || math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b)),
              s"$method/$f: got $a want $b")
          case (a, b) => assert(a == b, s"$method/$f: got $a want $b")
        }
      }
    }
  }
}
