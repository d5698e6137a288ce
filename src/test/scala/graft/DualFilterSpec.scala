package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.select.DualFilter._

/** Ports the reference's pure-function tests:
  * /root/reference/tests/testthat/test_dual_filter.R and the check_* helpers
  * in misc.R, plus R type-7 quantile and p.adjust(BH) parity values computed
  * from the published definitions. */
class DualFilterSpec extends AnyFunSuite {

  val scores: Seq[(String, Option[Double])] = Seq(
    "feature1" -> Some(0.25), "feature2" -> Some(0.1),
    "feature3" -> Some(0.5), "feature4" -> Some(0.9)
  )

  test("top_p=2 excludes features 1 and 2") {
    val ex = dualFilter(scores, Some(2), None, None, maximize = true)
    assert(ex.toSet == Set("feature1", "feature2"))
  }

  test("top_p=2 with cutoff=0.2 excludes only feature2 (OR composition)") {
    val ex = dualFilter(scores, Some(2), None, Some(0.2), maximize = true)
    assert(ex == Seq("feature2"))
  }

  test("top_p and threshold are mutually exclusive") {
    val e = intercept[IllegalArgumentException] {
      dualFilter(scores, Some(2), Some(0.5), Some(0.2), maximize = true)
    }
    assert(e.getMessage.contains("mutually exclusive"))
  }

  test("cutoff=0.7 maximize excludes 1-3") {
    val ex = dualFilter(scores, None, None, Some(0.7), maximize = true)
    assert(ex.toSet == Set("feature1", "feature2", "feature3"))
  }

  test("cutoff=0.7 minimize excludes feature4") {
    val ex = dualFilter(scores, None, None, Some(0.7), maximize = false)
    assert(ex == Seq("feature4"))
  }

  test("NA scores are always excluded") {
    val withNa = scores :+ ("feature5" -> (None: Option[Double]))
    val ex = dualFilter(withNa, Some(4), None, None, maximize = true)
    assert(ex == Seq("feature5"))
  }

  test("threshold branch uses type-7 quantile, >= when maximizing") {
    // quantile(c(0.1,0.25,0.5,0.9), 0.5) type7 = 0.375 => keep 0.5, 0.9
    val ex = dualFilter(scores, None, Some(0.5), None, maximize = true)
    assert(ex.toSet == Set("feature1", "feature2"))
  }

  test("threshold branch is strict < when minimizing") {
    // keep x < 0.375 => keep 0.1, 0.25; exclude 0.5, 0.9
    val ex = dualFilter(scores, None, Some(0.5), None, maximize = false)
    assert(ex.toSet == Set("feature3", "feature4"))
  }

  test("quantile type 7 matches R") {
    val x = Seq(1.0, 2.0, 3.0, 5.0, 7.0, 8.0)
    assert(math.abs(quantileType7(x, 0.5) - 4.0) < 1e-12)
    assert(math.abs(quantileType7(x, 0.25) - 2.25) < 1e-12)
    assert(math.abs(quantileType7(x, 0.9) - 7.5) < 1e-12)
    assert(quantileType7(Seq(4.2), 0.3) == 4.2)
  }

  test("check_top_p clamps: >= n -> n-1 (quirk), < 1 -> 1, truncation") {
    assert(checkTopP(Some(4), 4) == ((Some(3), Some(
      "`top_p` should be on (1, 4) based on the number of features available."))))
    assert(checkTopP(Some(9), 4)._1.contains(3))
    assert(checkTopP(Some(0), 4)._1.contains(1))
    assert(checkTopP(Some(-2), 4)._1.contains(1))
    assert(checkTopP(Some(2.7), 4) == ((Some(2), None)))
    assert(checkTopP(None, 4) == ((None, None)))
  }

  test("check_zero_one rejects out-of-range thresholds") {
    intercept[IllegalArgumentException](checkZeroOne(Some(0.0)))
    intercept[IllegalArgumentException](checkZeroOne(Some(1.0)))
    assert(checkZeroOne(Some(0.5)).contains(0.5))
    assert(checkZeroOne(None).isEmpty)
  }

  test("BH adjust matches R p.adjust(method='BH')") {
    // R: p.adjust(c(0.01, 0.02, 0.03, 0.04, 0.2), "BH")
    //    = 0.05 0.05 0.05 0.05 0.20
    val got = bhAdjust(Seq(0.01, 0.02, 0.03, 0.04, 0.2))
    val want = Seq(0.05, 0.05, 0.05, 0.05, 0.2)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
    // unsorted input keeps input order in output
    val got2 = bhAdjust(Seq(0.2, 0.01, 0.04, 0.02, 0.03))
    val want2 = Seq(0.2, 0.05, 0.05, 0.05, 0.05)
    got2.zip(want2).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("rescale maps to 0..100") {
    val r = rescale(Map("a" -> 1.0, "b" -> 3.0, "c" -> 2.0))
    assert(r("a") == 0.0 && r("b") == 100.0 && r("c") == 50.0)
  }
}
