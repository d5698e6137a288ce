package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.stats.MdlBinning

class MdlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("local MDL recursion: clean two-class boundary yields exactly that cut") {
    // values 1..10, classes A below 5.5, B above — one perfect cut at 5
    val values = (1 to 10).map(_.toDouble).toArray
    val counts = values.map(v => if (v <= 5) Array(10L, 0L) else Array(0L, 10L))
    val cuts = MdlBinning.mdlCutsLocal(values, counts)
    assert(cuts == Seq(5.0), s"got $cuts")
  }

  test("local MDL recursion: pure noise accepts no split") {
    val values = (1 to 20).map(_.toDouble).toArray
    val rng = new scala.util.Random(9)
    val counts = values.map(_ => Array(5L + rng.nextInt(3), 5L + rng.nextInt(3)))
    val cuts = MdlBinning.mdlCutsLocal(values, counts)
    assert(cuts.isEmpty, s"noise should not pass the MDL criterion, got $cuts")
  }

  test("local MDL recursion: three-class staircase yields two cuts") {
    val values = (1 to 30).map(_.toDouble).toArray
    val counts = values.map { v =>
      if (v <= 10) Array(20L, 0L, 0L) else if (v <= 20) Array(0L, 20L, 0L) else Array(0L, 0L, 20L)
    }
    val cuts = MdlBinning.mdlCutsLocal(values, counts)
    assert(cuts == Seq(10.0, 20.0), s"got $cuts")
  }

  test("distributed mdlCuts matches the local recursion on collected counts") {
    val rng = new scala.util.Random(4)
    val rows = (0 until 600).map { i =>
      val cls = i % 3
      (cls * 2.0 + rng.nextGaussian() * 0.4, rng.nextGaussian(), s"c$cls")
    }
    val df = rows.toDF("informative", "noise", "y")
    val got = MdlBinning.mdlCuts(df, Seq("informative", "noise"), "y")
    // independent local recompute
    def localCuts(sel: ((Double, Double, String)) => Double): Seq[Double] = {
      val byV = rows.groupBy(sel).toArray.sortBy(_._1)
      val classes = rows.map(_._3).distinct.sorted
      val cc = byV.map { case (_, rs) =>
        classes.map(c => rs.count(_._3 == c).toLong).toArray
      }
      MdlBinning.mdlCutsLocal(byV.map(_._1), cc)
    }
    assert(got("informative") == localCuts(_._1))
    assert(got("noise") == localCuts(_._2))
    assert(got("informative").nonEmpty, "informative feature must split")
    assert(got("noise").isEmpty, "noise must not split")
  }

  test("InfoGainStep with MDL binning: noise scores exactly 0 (single bin)") {
    val rng = new scala.util.Random(4)
    val df = (0 until 600).map { i =>
      val cls = i % 3
      (cls * 2.0 + rng.nextGaussian() * 0.4, rng.nextGaussian(), s"c$cls")
    }.toDF("informative", "noise", "y")
    val fitted = graft.select.InfoGainStep(topP = Some(1))
      .fit(df, "y", Seq("informative", "noise"))
    val m = fitted.scores.toMap
    assert(m("noise").contains(0.0), s"single-bin feature has zero IG: $m")
    assert(m("informative").get > 0.5)
    assert(fitted.excluded == Seq("noise"))
  }
}
