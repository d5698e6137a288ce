package graft.runtime

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Per-iteration checkpoints for long iterative jobs (k-means refinement,
  * PageRank sweeps): iteration k's state is one small JSON written
  * atomically to `<dir>/iter_<k>.json`. Unlike [[Checkpoints]] (fit-level,
  * java.nio, driver-local by design), this rides the Hadoop FileSystem API
  * so the checkpoint directory can live where a cluster job's state must —
  * HDFS/S3/ABFS as well as file:// (the Store/Snapshot convention; `rename`
  * is atomic on HDFS).
  *
  * Resume contract: [[latest]] returns the highest complete iteration; the
  * caller recomputes from there. [[save]] is IDEMPOTENT — when the target
  * exists the write is discarded, because every checkpointed algorithm here
  * is bit-deterministic (a crashed-and-resumed run recomputes the identical
  * state, so first-writer-wins loses nothing; a racing duplicate driver
  * cannot corrupt an existing file either).
  */
object IterativeCheckpoint {

  private def fsDir(spark: SparkSession, dir: String): (FileSystem, HPath) = {
    val p = new HPath(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private val IterFile = "iter_(\\d+)\\.json".r

  def save(spark: SparkSession, dir: String, iter: Int, payload: String): Unit = {
    require(iter >= 1, s"iterations are 1-based, got $iter")
    val (fs, root) = fsDir(spark, dir)
    fs.mkdirs(root)
    val target = new HPath(root, s"iter_$iter.json")
    if (fs.exists(target)) return // idempotent: deterministic state, first writer wins
    val tmp = new HPath(root, s".iter_$iter.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, false)
    try out.write(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false) // lost a race to an identical writer — fine
      require(fs.exists(target), s"checkpoint rename failed and no winner exists: $target")
    }
  }

  /** Delete iteration k's marker (callers owning side data delete that
    * themselves first — marker-last on write, marker-first on delete would
    * resurrect a half-deleted iteration, so deletion is marker FIRST). */
  def deleteMarker(spark: SparkSession, dir: String, iter: Int): Unit = {
    val (fs, root) = fsDir(spark, dir)
    fs.delete(new HPath(root, s"iter_$iter.json"), false)
  }

  /** All marked iterations under `dir` (ascending). */
  def iterations(spark: SparkSession, dir: String): Seq[Int] = {
    val (fs, root) = fsDir(spark, dir)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq.flatMap(_.getPath.getName match {
      case IterFile(k) => Some(k.toInt)
      case _           => None
    }).sorted
  }

  /** Highest complete iteration under `dir`, with its payload. */
  def latest(spark: SparkSession, dir: String): Option[(Int, String)] =
    iterations(spark, dir).lastOption.map { k =>
      val (fs, root) = fsDir(spark, dir)
      val in = fs.open(new HPath(root, s"iter_$k.json"))
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](65536)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        k -> new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    }
}
