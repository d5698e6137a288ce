package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.select._

/** Error-message and behavioral contracts ported from the reference's
  * testthat suite (test_step_select_fcbf.R:24–195 outcome-resolution
  * errors; misc.R contracts). */
class ContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val df = Seq((1.0, 2.0, "a"), (2.0, 1.0, "b")).toDF("x1", "x2", "y")

  test("get_outcome: multiple outcome roles abort with the reference message") {
    val e = intercept[IllegalArgumentException] {
      StepCommon.resolveOutcome(df, FeatureSpec(
        roles = Map("x1" -> "outcome", "y" -> "outcome")))
    }
    assert(e.getMessage.contains("Multiple outcome variables are present"))
    assert(e.getMessage.contains("supply the outcome variable using the `outcome` argument"))
  }

  test("get_outcome: no outcome aborts with the reference message") {
    val e = intercept[IllegalArgumentException] {
      StepCommon.resolveOutcome(df, FeatureSpec())
    }
    assert(e.getMessage.contains("An outcome variable was not found"))
  }

  test("get_outcome: missing column aborts naming the column") {
    val e = intercept[IllegalArgumentException] {
      StepCommon.resolveOutcome(df, FeatureSpec(outcome = Some("nope")))
    }
    assert(e.getMessage.contains("Outcome variable 'nope' not found"))
  }

  test("get_outcome: resolves by role when not named") {
    assert(StepCommon.resolveOutcome(df, FeatureSpec(roles = Map("y" -> "outcome"))) == "y")
    assert(StepCommon.resolveOutcome(df, FeatureSpec(outcome = Some("y"))) == "y")
  }

  test("threshold outside (0,1) aborts (check_zero_one contract)") {
    val e = intercept[IllegalArgumentException] {
      CorrStep(threshold = Some(1.0)).fit(
        df.withColumn("yy", $"x1" + $"x2"), "yy", Seq("x1", "x2"))
    }
    assert(e.getMessage.contains("`threshold` should be on (0, 1)"))
  }

  test("missing criteria abort (check_criteria contract)") {
    val e = intercept[IllegalArgumentException] {
      InfoGainStep().fit(df, "y", Seq("x1", "x2"))
    }
    assert(e.getMessage.contains("`top_p` and `threshold` cannot both be missing"))
    // reference quirk: check_criteria runs unconditionally in every step's
    // prep, so even cutoff-only aborts (dual_filter itself would accept it)
    val e2 = intercept[IllegalArgumentException] {
      InfoGainStep(cutoff = Some(0.1)).fit(df, "y", Seq("x1", "x2"))
    }
    assert(e2.getMessage.contains("cannot both be missing"))
  }

  test("top_p >= n clamps to n-1 with a warning carried on the fitted step") {
    val d = (0 until 100).map(i => (i.toDouble, -i.toDouble, i % 2 * 1.0, s"c${i % 2}"))
      .toDF("a", "b", "c", "y")
    val fitted = InfoGainStep(topP = Some(3)).fit(d, "y", Seq("a", "b", "c"))
    assert(fitted.warnings.exists(_.contains("`top_p` should be on (1, 3)")))
    // n-1 = 2 kept, 1 excluded — the reference's deliberate quirk
    assert(fitted.excluded.length == 1)
  }

  test("FCBF cutpoint outside (0,1) or NaN aborts with the reference message (step_select_fcbf.R:87-92)") {
    Seq(0.0, 1.0, 1.5, -0.25, Double.NaN).foreach { bad =>
      val e = intercept[IllegalArgumentException](FcbfStep(cutpoint = bad))
      assert(e.getMessage.contains("`cutpoint` must be a number between 0-1"), s"cutpoint=$bad")
    }
    // boundary-exclusive: 0.5 and other interior values construct fine
    FcbfStep(cutpoint = 0.5); FcbfStep(cutpoint = 0.25); FcbfStep(cutpoint = 0.999)
  }

  test("FCBF drops all-null columns with a warning (step_select_fcbf.R:296-309)") {
    val d = Seq(
      (1.0, null.asInstanceOf[java.lang.Double], "a"),
      (2.0, null.asInstanceOf[java.lang.Double], "b"),
      (3.0, null.asInstanceOf[java.lang.Double], "a"),
      (4.0, null.asInstanceOf[java.lang.Double], "b")
    ).toDF("ok", "allnull", "y")
    val fitted = FcbfStep(minimumSu = 0.0).fit(d, "y", Seq("ok", "allnull"))
    assert(fitted.warnings.exists(w => w.contains("allnull") && w.contains("NULL")))
    assert(fitted.excluded.contains("allnull"))
  }
}
