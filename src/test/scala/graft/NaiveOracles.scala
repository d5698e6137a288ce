package graft

/** Tiny single-threaded reference implementations of the published score
  * definitions (SURVEY.md §5: "an in-repo tiny pure-Scala single-threaded
  * oracle that the distributed path must match exactly — this tests
  * distribution correctness independently of formula correctness"). */
object NaiveOracles {

  /** Natural-log entropy of a label sequence. */
  def entropy[A](xs: Seq[A]): Double = {
    val n = xs.size.toDouble
    xs.groupBy(identity).values.map { g =>
      val p = g.size / n
      -p * math.log(p)
    }.sum
  }

  def jointEntropy[A, B](xs: Seq[A], ys: Seq[B]): Double = entropy(xs.zip(ys))

  def infoGain[A, B](xs: Seq[A], ys: Seq[B]): Double =
    entropy(xs) + entropy(ys) - jointEntropy(xs, ys)

  def symUncert[A, B](xs: Seq[A], ys: Seq[B]): Double = {
    val hx = entropy(xs); val hy = entropy(ys)
    if (hx + hy == 0) 0.0 else 2 * infoGain(xs, ys) / (hx + hy)
  }

  def gainRatio[A, B](xs: Seq[A], ys: Seq[B]): Double = {
    val hx = entropy(xs)
    if (hx == 0) 0.0 else infoGain(xs, ys) / hx
  }

  def pearson(x: Seq[Double], y: Seq[Double]): Double = {
    val n = x.size
    val mx = x.sum / n; val my = y.sum / n
    val cov = x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum
    val sx = math.sqrt(x.map(a => (a - mx) * (a - mx)).sum)
    val sy = math.sqrt(y.map(b => (b - my) * (b - my)).sum)
    cov / (sx * sy)
  }

  /** Mid-ranks (ties.method = "average"), 1-based. */
  def midRanks(x: Seq[Double]): Seq[Double] = {
    val sortedIdx = x.zipWithIndex.sortBy(_._1)
    val ranks = new Array[Double](x.size)
    var i = 0
    while (i < sortedIdx.size) {
      var j = i
      while (j + 1 < sortedIdx.size && sortedIdx(j + 1)._1 == sortedIdx(i)._1) j += 1
      val avg = (i + j + 2) / 2.0 // average of 1-based ranks i+1..j+1
      (i to j).foreach(k => ranks(sortedIdx(k)._2) = avg)
      i = j + 1
    }
    ranks.toSeq
  }

  def spearman(x: Seq[Double], y: Seq[Double]): Double =
    pearson(midRanks(x), midRanks(y))

  /** Mann–Whitney AUC with mid-ranks, direction fixed (pos > neg). */
  def auc(values: Seq[Double], isPos: Seq[Boolean]): Double = {
    val ranks = midRanks(values)
    val nPos = isPos.count(identity).toDouble
    val nNeg = isPos.size - nPos
    val rPos = ranks.zip(isPos).collect { case (r, true) => r }.sum
    (rPos - nPos * (nPos + 1) / 2) / (nPos * nNeg)
  }

  /** χ² statistic with R's 2×2 Yates correction. */
  def chisqStat[A, B](xs: Seq[A], ys: Seq[B]): Double = {
    val xl = xs.distinct; val yl = ys.distinct
    val n = xs.size.toDouble
    val yates = xl.size == 2 && yl.size == 2
    (for (a <- xl; b <- yl) yield {
      val o = xs.zip(ys).count { case (xa, yb) => xa == a && yb == b }.toDouble
      val e = xs.count(_ == a) * ys.count(_ == b) / n
      val d0 = math.abs(o - e)
      val d = if (yates) d0 - math.min(0.5, d0) else d0
      if (e > 0) d * d / e else 0.0
    }).sum
  }
}
