package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video treated as opaque `binary` columns
  * with typed metadata. The Spark-side plumbing — schema, partitioning,
  * batch iteration shape, container-format sniffing — is real; the actual
  * media DECODE is STUBBED with a deterministic fake (the image/audio codec
  * libraries are not in this container). Swap [[StubCodec.decodeImage]] for
  * a real codec (e.g. TwelveMonkeys/JavaCV) without touching the plumbing.
  */
object BinaryFeatures {

  /** Container sniffing from magic bytes — REAL (these are the published
    * file signatures), pure Column expr, codegen-eligible. */
  def containerFormat(bytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = hex(substring(bytes, 1, 12))
    when(h.startsWith("FFD8FF"), "jpeg")
      .when(h.startsWith("89504E47"), "png")
      .when(h.startsWith("47494638"), "gif")
      .when(h.startsWith("52494646") && substring(h, 17, 8) === "57415645", "wav")
      .when(substring(h, 9, 8) === "66747970", "mp4")
      .when(h.startsWith("3C68746D6C") || h.startsWith("3C21444F43") || h.startsWith("3C485454"), "html")
      .otherwise("unknown")
  }

  final case class MediaRow(id: Long, bytes: Array[Byte])
  final case class MediaFeatures(
      id: Long,
      n_bytes: Long,
      format: String,
      content_hash: Long,
      width: Int,     // stubbed decode output
      height: Int,    // stubbed decode output
      mean_luma: Double // stubbed decode output
  )

  /** ====== STUB ====== deterministic fake decoder: derives pseudo
    * dimensions/luma from a content hash. Replace with a real image codec;
    * the signature (bytes in, small typed struct out) is the contract. */
  object StubCodec {
    def decodeImage(bytes: Array[Byte]): (Int, Int, Double) = {
      var h = 1125899906842597L
      var i = 0
      while (i < math.min(bytes.length, 256)) { h = 31 * h + bytes(i); i += 1 }
      val w = 64 + math.floorMod(h, 1024).toInt
      val ht = 64 + math.floorMod(h >> 16, 1024).toInt
      val luma = math.floorMod(h >> 32, 256).toDouble / 255.0
      (w, ht, luma)
    }
  }

  /** Per-partition batch decode — the mapInPandas analogue on the typed
    * Dataset API: one iterator pass per partition, no per-row task setup,
    * decode parallelism = partition parallelism. Metadata features
    * (n_bytes, format via magic bytes, content hash) are REAL; width/
    * height/mean_luma come from the stub codec. */
  def decodeFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val fmt = sniff(row.bytes)
        var h = 1125899906842597L
        var i = 0
        while (i < row.bytes.length) { h = 31 * h + row.bytes(i); i += 1 }
        val (w, ht, luma) = StubCodec.decodeImage(row.bytes)
        MediaFeatures(row.id, row.bytes.length.toLong, fmt, h, w, ht, luma)
      }
    }
  }

  private def sniff(b: Array[Byte]): String = {
    def at(i: Int) = if (i < b.length) b(i) & 0xff else -1
    if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "jpeg"
    else if (at(0) == 0x89 && at(1) == 0x50 && at(2) == 0x4e && at(3) == 0x47) "png"
    else if (at(0) == 0x47 && at(1) == 0x49 && at(2) == 0x46 && at(3) == 0x38) "gif"
    else if (at(0) == 0x52 && at(1) == 0x49 && at(2) == 0x46 && at(3) == 0x46 &&
      at(8) == 0x57 && at(9) == 0x41 && at(10) == 0x56 && at(11) == 0x45) "wav"
    else if (at(4) == 0x66 && at(5) == 0x74 && at(6) == 0x79 && at(7) == 0x70) "mp4"
    else if (at(0) == '<') "html"
    else "unknown"
  }

  /** Frame sampling stub for video-like payloads: REAL byte-range slicing
    * (every k-th chunk of `chunk` bytes — the seek pattern a real demuxer
    * would use), fake frame decode. */
  def sampleChunks(df: DataFrame, bytesCol: String, every: Int, chunk: Int, maxChunks: Int): DataFrame =
    df.withColumn(
      "chunks",
      filter(
        transform(sequence(lit(0), lit(maxChunks - 1)),
          i => substring(col(bytesCol), i * every * chunk + 1, lit(chunk))),
        c => length(c) > 0))
}
