package graft.select

/** Driver-side selection kernel shared by every scoring step.
  *
  * Re-expresses the reference's shared filter rule
  * (/root/reference/R/misc.R:1–176) in Scala. Scores are O(#features), so this
  * math intentionally runs on the driver over a collected score map — the
  * distributed work is producing the scores, not filtering them.
  *
  * Semantics pinned to the reference:
  *  - dual_filter (misc.R:86–134): NA scores always excluded; sort by score
  *    (desc iff maximize); keep = rank<=top_p OR (score >= type-7
  *    quantile(threshold) when maximizing, score < quantile when minimizing)
  *    OR (score >= cutoff when maximizing, <= when minimizing); top_p and
  *    threshold are mutually exclusive.
  *  - check_top_p (misc.R:16–44): top_p >= n clamps to n-1 (quirk), < 1
  *    clamps to 1, non-integer truncates.
  *  - check_zero_one (misc.R:1–14): threshold strictly inside (0, 1).
  *  - quantile is R type 7 (linear interpolation, h = (n-1)p).
  */
object DualFilter {

  /** R stats::quantile type 7 on non-empty values. */
  def quantileType7(values: Seq[Double], p: Double): Double = {
    require(values.nonEmpty, "quantile of empty vector")
    val sorted = values.sorted.toIndexedSeq
    val n = sorted.length
    val h = (n - 1) * p
    val lo = math.floor(h).toInt
    val hi = math.min(lo + 1, n - 1)
    sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo))
  }

  /** misc.R:16–44 — clamp top_p against the feature count n.
    * Returns (clamped value, optional warning message). */
  def checkTopP(topP: Option[Double], n: Int): (Option[Int], Option[String]) =
    topP match {
      case None => (None, None)
      case Some(raw) =>
        val x = raw.toInt // as.integer truncates toward zero
        val msg =
          s"`top_p` should be on (1, $n) based on the number of features available."
        if (x >= n) (Some(math.min(n - 1, x)), Some(msg))
        else if (x < 1) (Some(1), Some(msg))
        else (Some(x), None)
    }

  /** misc.R:1–14 — threshold must be on open (0,1). */
  def checkZeroOne(threshold: Option[Double]): Option[Double] = {
    threshold.foreach { t =>
      require(t > 0 && t < 1, "`threshold` should be on (0, 1).")
    }
    threshold
  }

  /** misc.R:46–56 — at least one criterion. */
  def checkCriteria(topP: Option[Double], threshold: Option[Double], stepName: String): Unit =
    require(
      topP.isDefined || threshold.isDefined,
      s"For `$stepName`, `top_p` and `threshold` cannot both be missing."
    )

  /** misc.R:86–134 — returns the feature names to EXCLUDE.
    * `scores` may contain None values (R NA): those are always excluded.
    * Order of the returned names: non-kept in score-sorted order, then NAs —
    * matching the reference's `c(names(x)[!keep_lgl], names(na_x))`.
    */
  def dualFilter(
      scores: Seq[(String, Option[Double])],
      topP: Option[Int],
      threshold: Option[Double],
      cutoff: Option[Double],
      maximize: Boolean
  ): Seq[String] = {
    require(
      !(topP.isDefined && threshold.isDefined),
      "`top_p` and `threshold` are mutually exclusive"
    )
    val naNames = scores.collect { case (n, None) => n } ++
      scores.collect { case (n, Some(v)) if v.isNaN => n }
    val present = scores.collect { case (n, Some(v)) if !v.isNaN => (n, v) }
    // stable sort: ties keep input order, matching R's stable radix sort
    val sorted =
      if (maximize) present.sortBy { case (_, v) => -v }
      else present.sortBy { case (_, v) => v }

    val vals = sorted.map(_._2)
    val topPLgl: Seq[Boolean] = topP match {
      case Some(k) => sorted.indices.map(_ < k)
      case None    => Seq.fill(sorted.length)(false)
    }
    val thresholdLgl: Seq[Boolean] = threshold match {
      case Some(t) =>
        val q = quantileType7(vals, t)
        if (maximize) vals.map(_ >= q) else vals.map(_ < q)
      case None => Seq.fill(sorted.length)(false)
    }
    val cutoffLgl: Seq[Boolean] = cutoff match {
      case Some(c) =>
        if (maximize) vals.map(_ >= c) else vals.map(_ <= c)
      case None => Seq.fill(sorted.length)(false)
    }
    val keep = sorted.indices.map(i => topPLgl(i) || thresholdLgl(i) || cutoffLgl(i))
    sorted.indices.collect { case i if !keep(i) => sorted(i)._1 } ++ naNames
  }

  /** Benjamini–Hochberg FDR adjust, replicating R p.adjust(method="BH"):
    * p_adj_(i) = min_{j>=i}( p_(j) * n / j ) capped at 1, computed over the
    * ascending-sorted p-values; result returned in the input order.
    * (step_select_xtab.R:126–128 applies this to the score vector.) */
  def bhAdjust(p: Seq[Double]): Seq[Double] = {
    val n = p.length
    if (n == 0) return p
    val idxByDesc = p.zipWithIndex.sortBy { case (v, _) => -v }
    val adj = new Array[Double](n)
    var cummin = Double.PositiveInfinity
    var rank = n // descending traversal: ranks n, n-1, ..., 1
    idxByDesc.foreach { case (v, origIdx) =>
      val cand = v * n / rank
      cummin = math.min(cummin, cand)
      adj(origIdx) = math.min(1.0, cummin)
      rank -= 1
    }
    adj.toSeq
  }

  /** pull_importances.R:57–58 — min-max rescale to 0..100. */
  def rescale(x: Map[String, Double]): Map[String, Double] = {
    if (x.isEmpty) return x
    val mn = x.values.min
    val mx = x.values.max
    if (mx == mn) x.map { case (k, _) => k -> 0.0 }
    else x.map { case (k, v) => k -> (v - mn) / (mx - mn) * 100.0 }
  }
}
