package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.select.DualFilter

/** ScalaCheck properties over the selection kernel (SURVEY §5: "add
  * ScalaCheck properties (e.g., excluded ∪ kept = all, monotonicity of
  * top_p)"). Run through raw scalacheck (no scalatestplus bridge in the
  * offline cache). */
class PropertySpec extends AnyFunSuite {

  def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  val scoresGen: Gen[List[(String, Option[Double])]] = for {
    n <- Gen.choose(1, 20)
    vals <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(-100.0, 100.0).map(Option(_)), Gen.const(None: Option[Double])))
  } yield vals.zipWithIndex.map { case (v, i) => s"f$i" -> v }

  test("excluded ⊆ all features; no duplicates") {
    check(Prop.forAll(scoresGen, Gen.choose(1, 25), Gen.oneOf(true, false)) {
      (scores, k, maximize) =>
        val ex = DualFilter.dualFilter(scores, Some(k), None, None, maximize)
        ex.toSet.subsetOf(scores.map(_._1).toSet) && ex.distinct == ex
    })
  }

  test("larger top_p never excludes more") {
    check(Prop.forAll(scoresGen, Gen.choose(1, 10)) { (scores, k) =>
      val e1 = DualFilter.dualFilter(scores, Some(k), None, None, maximize = true).toSet
      val e2 = DualFilter.dualFilter(scores, Some(k + 1), None, None, maximize = true).toSet
      e2.subsetOf(e1)
    })
  }

  test("NA scores are always excluded regardless of criteria") {
    check(Prop.forAll(scoresGen, Gen.choose(1, 10)) { (scores, k) =>
      val nas = scores.collect { case (n, None) => n }.toSet
      nas.subsetOf(DualFilter.dualFilter(scores, Some(k), None, None, maximize = true).toSet)
    })
  }

  test("cutoff OR top_p keeps at least as much as either alone") {
    check(Prop.forAll(scoresGen, Gen.choose(1, 10), Gen.choose(-50.0, 50.0)) { (scores, k, c) =>
      val both = DualFilter.dualFilter(scores, Some(k), None, Some(c), maximize = true).toSet
      val justK = DualFilter.dualFilter(scores, Some(k), None, None, maximize = true).toSet
      val justC = DualFilter.dualFilter(scores, None, None, Some(c), maximize = true).toSet
      both.subsetOf(justK) && both.subsetOf(justC)
    })
  }

  test("type-7 quantile is monotone in p and bounded by min/max") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6)),
      Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (xs, p1, p2) =>
      val (lo, hi) = (math.min(p1, p2), math.max(p1, p2))
      val q1 = DualFilter.quantileType7(xs, lo)
      val q2 = DualFilter.quantileType7(xs, hi)
      q1 <= q2 + 1e-9 && q1 >= xs.min - 1e-9 && q2 <= xs.max + 1e-9
    })
  }

  test("BH adjust: >= raw p, capped at 1, order-preserving") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0.0, 1.0))) { ps =>
      val adj = DualFilter.bhAdjust(ps)
      val byP = ps.zip(adj).sortBy(_._1).map(_._2)
      adj.forall(_ <= 1.0 + 1e-12) &&
        ps.zip(adj).forall { case (p, a) => a >= p - 1e-12 } &&
        byP == byP.sorted
    })
  }

  test("dedup exact: output multiset = distinct input keys (model check)") {
    check(Prop.forAll(Gen.listOf(Gen.choose(0, 30))) { keys =>
      // model of Dedup.exact/dedupByLag key semantics without Spark:
      // keep first occurrence per key
      val kept = keys.zipWithIndex.groupBy(_._1).map(_._2.minBy(_._2)).toSeq.sortBy(_._2).map(_._1)
      kept.toSet == keys.toSet && kept.size == keys.distinct.size
    })
  }

  test("line dedup model: kept+removed partition the lines; kept order preserved; frequent lines gone") {
    val lineGen = Gen.listOf(Gen.choose(0, 8)) // small alphabet forces collisions
    check(Prop.forAll(Gen.listOf(lineGen), Gen.choose(1, 3)) { (docs, maxCount) =>
      // model of Dedup.dedupLines without Spark
      val freq = docs.flatten.groupBy(identity).view.mapValues(_.size).toMap
      docs.forall { doc =>
        val kept = doc.filter(l => freq(l) <= maxCount)
        val removed = doc.filterNot(l => freq(l) <= maxCount)
        kept.size + removed.size == doc.size &&
          kept == doc.filter(kept.contains) && // subsequence: order preserved
          removed.forall(l => freq(l) > maxCount)
      }
    })
  }

  test("packing model: chunks never exceed budget, every token packed exactly once") {
    check(Prop.forAll(
      Gen.nonEmptyListOf(Gen.choose(0L, 50L)), Gen.choose(1L, 40L)) { (toks, budget) =>
      // model of Packing.packSequences: global offsets by running sum
      val starts = toks.scanLeft(0L)(_ + _)
      val spans = toks.zip(starts).filter(_._1 > 0).map { case (n, s) =>
        (s / budget, (s + n - 1) / budget, s, n)
      }
      val total = toks.sum
      // offsets tile [0, total) with no gaps or overlaps
      val tiles = toks.zip(starts).map { case (n, s) => (s, s + n) }
      val contiguous = tiles.sliding(2).forall {
        case Seq((_, e), (s, _)) => e == s
        case _                   => true
      }
      contiguous && (tiles.isEmpty || tiles.last._2 == total) &&
        // a doc's span covers ceil over the right chunk ids
        spans.forall { case (first, last, s, n) =>
          first <= last && first == s / budget && last == (s + n - 1) / budget
        }
    })
  }

  test("stratified sampling model: kept set is the per-stratum hash-threshold set, nested in fractions") {
    check(Prop.forAll(Gen.listOf(Gen.choose(0L, 100000L)),
      Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (keys, f1, f2) =>
      val (lo, hi) = (math.min(f1, f2), math.max(f1, f2))
      def bucket(k: Long) = (k * 2654435761L % 1000003L).abs / 1000003.0
      val keptLo = keys.filter(bucket(_) < lo).toSet
      val keptHi = keys.filter(bucket(_) < hi).toSet
      // monotone nesting: raising a stratum's fraction only ADDS documents —
      // the property that makes hash sampling reproducible across config
      // changes (unlike RNG sampling, which reshuffles membership)
      keptLo.subsetOf(keptHi)
    })
  }
}
