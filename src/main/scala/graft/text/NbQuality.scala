package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BucketWeightSum, WordGramHashes}

/** Trainable model-based quality filter — the fastText-classifier gate of
  * modern curation pipelines (DCLM, FineWeb-Edu, RedPajama-2 all filter on
  * a linear text classifier trained to separate a "good" seed from random
  * crawl) reduced to its deterministic engine-native core: multinomial
  * Naive Bayes over HASHED bag-of-words features. Training is exact
  * integer counting (reproducible at any parallelism, no SGD/RNG); the
  * learned per-bucket log-odds weights make scoring a linear model —
  * the same wᵀx + b shape fastText learns, with NB's closed-form w.
  *
  * Scale shape:
  *  - fit = ONE corpus scan (explode unigram hashes → groupBy bucket with
  *    map-side partial agg — shuffle ≤ 2·B rows) + one tiny label-count
  *    agg; the collected model is bounded by B ≤ 2²⁰ BEFORE transfer.
  *  - score = ZERO shuffles: the weight table rides into
  *    [[graft.functions.BucketWeightSum]] as one referenced object and
  *    each document is scored in a single codegen loop over its token
  *    hashes — no explode, no join, pure map-side at any corpus size.
  *
  * Features are md5-48 word-unigram hashes ([[WordGramHashes]], the
  * portable dual-hash convention) bucketed by `pmod(h, B)`, so the DuckDB
  * oracle replays training AND scoring end-to-end (q_nb_quality).
  *
  * score(doc) = ln(P(good)/P(bad)) + Σ_tokens w(bucket(token)),
  * w(b) = ln((c⁺(b)+α)/(T⁺+αB)) − ln((c⁻(b)+α)/(T⁻+αB))  (add-α).
  *
  * Documents with null `positive` labels count as NEGATIVE examples (the
  * conservative default for a quality seed: unlabeled ≠ good); null text
  * contributes no tokens to training and scores null.
  */
object NbQuality {

  /** buckets ≤ 2²⁰ bounds the driver-side model collect (~24 MB of count
    * rows worst-case) and the broadcast weight table (8 MB). */
  val MaxBuckets: Int = 1 << 20

  case class Model(
      weights: Array[Double],
      bias: Double,
      alpha: Double,
      posTokens: Long,
      negTokens: Long,
      posDocs: Long,
      negDocs: Long) {
    def buckets: Int = weights.length
  }

  def fit(
      df: DataFrame,
      text: String,
      positive: Column,
      buckets: Int = 1 << 16,
      alpha: Double = 1.0): Model = {
    require(buckets >= 2 && buckets <= MaxBuckets,
      s"buckets must be in [2, $MaxBuckets], got $buckets")
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    val lab = df.select(coalesce(positive.cast("boolean"), lit(false)).as("__pos"),
      col(text).as("__t"))
    // one corpus scan; shuffle bounded by 2B count rows after partial agg
    val cnt = lab
      .select(col("__pos"), explode(explodeHashes(col("__t"))).as("__h"))
      .select(col("__pos"), pmod(col("__h"), lit(buckets.toLong)).as("__b"))
      .groupBy("__b")
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("cp"),
        sum(when(!col("__pos"), 1L).otherwise(0L)).as("cn"))
      .collect() // bounded: <= buckets rows by construction
    val cp = new Array[Long](buckets)
    val cn = new Array[Long](buckets)
    cnt.foreach { r =>
      val b = r.getLong(0).toInt
      cp(b) = r.getLong(1); cn(b) = r.getLong(2)
    }
    val posTokens = cp.sum
    val negTokens = cn.sum
    val docs = lab.groupBy("__pos").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val posDocs = docs.getOrElse(true, 0L)
    val negDocs = docs.getOrElse(false, 0L)
    require(posDocs > 0 && negDocs > 0,
      s"NbQuality.fit needs both classes non-empty, got positive=$posDocs negative=$negDocs")
    val denomP = posTokens + alpha * buckets
    val denomN = negTokens + alpha * buckets
    val w = Array.tabulate(buckets) { b =>
      math.log((cp(b) + alpha) / denomP) - math.log((cn(b) + alpha) / denomN)
    }
    Model(w, math.log(posDocs.toDouble / negDocs), alpha,
      posTokens, negTokens, posDocs, negDocs)
  }

  // the shared tokenization: raw md5-48 unigram hashes; bucketing happens
  // per call site (pmod after explode in fit, floorMod inside the fused
  // BucketWeightSum in logOdds — identical values)
  private def explodeHashes(text: Column): Column =
    WordGramHashes.gramHashes48(text, 1)

  /** log-odds score column: bias + fused bucket-weight sum (map-side). */
  def logOdds(text: Column, m: Model): Column =
    lit(m.bias) + BucketWeightSum.bucketWeightSum(explodeHashes(text), m.weights)

  def score(df: DataFrame, id: String, text: String, m: Model): DataFrame =
    df.select(col(id), logOdds(col(text), m).as("log_odds"))
}
