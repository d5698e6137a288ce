package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  *  - [[cosineToQuery]] / [[bruteForceTopK]] — exact baseline: codegen'd
  *    `zip_with`/`aggregate` dot products against a broadcast query vector;
  *    one narrow pass + a small top-k.
  *  - [[lshBuckets]] / [[lshTopK]] — the scale path: sign-random-projection
  *    LSH; only rows sharing the query's bucket (or a probe set of buckets)
  *    are scored. Hyperplanes are derived deterministically from a seed via
  *    splitmix-style integer mixing — no RNG state, identical across
  *    executors and reruns.
  *  - [[ivfAssign]] — IVF-style coarse quantization: assign each vector to
  *    the nearest of `centroids`; queries score only their cell (callers
  *    pick nprobe cells). Centroids are caller-provided (e.g. sampled seed
  *    vectors), keeping the operator deterministic.
  */
object Similarity {

  /** Cosine similarity of `vec` (array<float/double>) against a constant
    * query vector, computed in double precision. Built-in higher-order-
    * function formulation — kept as the reference implementation that the
    * fused native expression is asserted bit-for-bit against. */
  def cosineBuiltin(vec: Column, query: Seq[Double]): Column = {
    val q = array(query.map(lit): _*)
    val v = transform(vec, _.cast("double"))
    val dot = aggregate(zip_with(v, q, (a, b) => a * b), lit(0.0), (acc, x) => acc + x)
    val nv = sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nq = math.sqrt(query.map(x => x * x).sum)
    when(nv === 0.0, lit(0.0)).otherwise(dot / (nv * nq))
  }

  /** Hot-path cosine: the fused single-loop Catalyst expression
    * ([[graft.functions.CosineSimilarity]]) — no intermediate arrays,
    * whole-stage codegen; identical results to [[cosineBuiltin]]. */
  def cosine(vec: Column, query: Seq[Double]): Column =
    graft.functions.ArrayMath.cosineSimTo(vec, query)

  def cosineToQuery(df: DataFrame, vecCol: String, query: Seq[Double]): DataFrame =
    df.withColumn("cosine", cosine(col(vecCol), query))

  /** Exact top-k by cosine: per-partition top-k then global top-k (Spark's
    * sort+limit already executes as TakeOrderedAndProject — no full sort). */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String, query: Seq[Double], k: Int): DataFrame =
    cosineToQuery(df, vecCol, query)
      .select(col(idCol), col("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * splitmix64-inspired integer mix folded to [-1, 1]. */
  private def planeComponent(plane: Int, dim: Int, seed: Long): Double = {
    var z = seed + plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim)((p, d) => planeComponent(p, d, seed))

  /** Sign-random-projection bucket id: bit p = sign(vec · plane_p). */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val v = transform(vec, _.cast("double"))
    planes.zipWithIndex.map { case (plane, p) =>
      val q = array(plane.map(lit).toIndexedSeq: _*)
      val dot = aggregate(zip_with(v, q, (a, b) => a * b), lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  def lshBuckets(df: DataFrame, vecCol: String, planes: Array[Array[Double]]): DataFrame =
    df.withColumn("bucket", lshBucket(col(vecCol), planes))

  /** The query vector's LSH bucket, computed driver-side. */
  def queryBucket(query: Seq[Double], planes: Array[Array[Double]]): Long = {
    var acc = 0L
    planes.zipWithIndex.foreach { case (plane, p) =>
      val dot = plane.zip(query).map { case (a, b) => a * b }.sum
      if (dot >= 0) acc |= (1L << p)
    }
    acc
  }

  /** Multi-probe bucket set: every bucket within Hamming distance
    * <= maxHamming of `bucket` (flip every subset of <= maxHamming plane
    * bits). Size = Σ_{h<=maxHamming} C(nPlanes, h) — a driver-side literal
    * list, so the scan stays a pruned IN-filter. */
  def probeBuckets(bucket: Long, nPlanes: Int, maxHamming: Int): Seq[Long] = {
    def rec(start: Int, left: Int, cur: Long): Seq[Long] =
      cur +: (if (left == 0) Seq.empty
              else (start until nPlanes).flatMap(i => rec(i + 1, left - 1, cur ^ (1L << i))))
    rec(0, maxHamming, bucket)
  }

  /** ANN top-k with multi-probe LSH: score the query's bucket plus all
    * buckets within `probeHamming` flipped planes (near-miss vectors usually
    * differ in the planes whose dot product is closest to 0 — probing
    * Hamming-adjacent buckets recovers them). probeHamming = 2 on 6 planes
    * scans ~22/64 of the space; 0 = single-probe. */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      planes: Array[Array[Double]],
      probeHamming: Int = 2
  ): DataFrame = {
    val probes = probeBuckets(queryBucket(query, planes), planes.length, probeHamming)
    lshBuckets(df, vecCol, planes)
      .where(col("bucket").isin(probes: _*))
      .transform(d => bruteForceTopK(d, idCol, vecCol, query, k))
  }

  /** IVF coarse assignment: nearest centroid by cosine. `centroids` is small
    * (broadcast as literals). Adds `cell`. Ties on similarity break toward
    * the LARGER cell index (greatest() over (sim, cell) structs). */
  def ivfAssign(df: DataFrame, vecCol: String, centroids: Seq[Seq[Double]]): DataFrame = {
    val sims = centroids.zipWithIndex.map { case (c, i) =>
      struct(cosine(col(vecCol), c).as("sim"), lit(i).as("cell"))
    }
    df.withColumn("cell", greatest(sims: _*).getField("cell"))
  }

  /** Deterministic IVF centroid seeding: the k vectors with the smallest
    * seeded id-hash — a hash-random sample that is identical at any
    * parallelism (no RNG, no data-order dependence). Lloyd refinement is
    * deliberately NOT applied here: distributed float averaging is
    * summation-order-dependent, which would break the engine's
    * rerun/parallelism determinism contract; callers wanting refined
    * centroids should refine offline and pass them in. */
  def seedCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int, seed: Long = 42L): Seq[Seq[Double]] =
    df.select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
      .limit(k)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq)
      .toSeq

  private def cosLocal(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** IVF search: assign every vector to its nearest centroid, pick the
    * `nprobe` cells whose centroids are most cosine-similar to the query
    * (driver-side over the tiny centroid list, ties toward larger index —
    * mirroring [[ivfAssign]]), and exact-rerank ONLY those cells. The scan
    * reads |probed cells| / |cells| of the data — the IVF recall/cost knob. */
  def ivfTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      centroids: Seq[Seq[Double]],
      nprobe: Int
  ): DataFrame = {
    require(nprobe >= 1 && nprobe <= centroids.length, "nprobe must be in [1, #centroids]")
    val probeCells = centroids.zipWithIndex
      .map { case (c, i) => (cosLocal(query, c), i) }
      .sortBy { case (s, i) => (-s, -i) }
      .take(nprobe).map(_._2)
    ivfAssign(df, vecCol, centroids)
      .where(col("cell").isin(probeCells: _*))
      .transform(d => bruteForceTopK(d, idCol, vecCol, query, k))
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucket join then exact
    * cosine filter — the embedding analogue of MinHash banding. */
  def cosineNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Array[Array[Double]],
      minCosine: Double
  ): DataFrame = {
    val b = lshBuckets(df, vecCol, planes).select(col(idCol), col(vecCol), col("bucket"))
    val l = b.select(col("bucket"), col(idCol).as("a"), col(vecCol).as("va"))
    val r = b.select(col("bucket"), col(idCol).as("b"), col(vecCol).as("vb"))
    l.join(r, "bucket")
      .where(col("a") < col("b"))
      .withColumn("cosine", graft.functions.ArrayMath.cosineSim(col("va"), col("vb")))
      .where(col("cosine") >= minCosine)
      .select("a", "b", "cosine")
      .distinct()
  }
}
