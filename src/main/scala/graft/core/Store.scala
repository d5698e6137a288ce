package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table layout for the pages corpus — the Iceberg layout from SURVEY §1.4
  * (`partitioned by days(warc_ts), bucketed by url`) expressed on plain
  * parquet, which is what this sandbox ships (no Iceberg jar): a `dt` day
  * partition column + optional url-hash bucket column. On a real deployment
  * the same calls switch to `df.writeTo(table).partitionedBy(days($"warc_ts"),
  * bucket(N, $"url"))` with no other code change — every reader below goes
  * through time predicates that prune partitions either way.
  */
object Store {

  /** Write pages partitioned by crawl day (and optionally url buckets).
    * Day partitioning makes label-time predicates prune whole directories;
    * bucketing co-locates a url's revisits for the as-of/window exchange. */
  def writePages(df: DataFrame, path: String, urlBuckets: Int = 0): Unit = {
    val withDt = df.withColumn("dt", to_date(col("warc_ts")))
    val (out, cols) =
      if (urlBuckets > 0)
        (withDt.withColumn("ub", pmod(xxhash64(col("url")), lit(urlBuckets))), Seq("dt", "ub"))
      else (withDt, Seq("dt"))
    out.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)
  }

  def readPages(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Time-bounded scan: the `dt` predicate prunes day partitions at
    * planning time (no file listing for excluded days), the `warc_ts`
    * predicate is pushed to parquet row groups. Use for every
    * "features as of T" computation — nothing after maxTs is even read,
    * which also makes temporal leakage structurally impossible at the scan.
    */
  def pagesUpTo(spark: SparkSession, path: String, maxTs: java.sql.Timestamp): DataFrame =
    readPages(spark, path)
      .where(col("dt") <= to_date(lit(maxTs)) && col("warc_ts") <= lit(maxTs))

  /** Feature-vector sink with lineage: writes the data partitioned by label
    * day plus a `_metrics` JSON table of per-partition row counts/digests
    * (north_rule: metrics alongside outputs). */
  def writeFeatures(df: DataFrame, path: String, labelTs: String = "label_ts"): Unit = {
    val withDt = df.withColumn("dt", to_date(col(labelTs)))
    withDt.write.mode(SaveMode.Overwrite).partitionBy("dt").parquet(path)
    graft.runtime.Lineage.writeMetrics(
      graft.runtime.Lineage.partitionMetrics(withDt, Seq(labelTs)), path + "_metrics")
  }

  /** One compaction result row. `partition` is the path relative to the
    * store root (e.g. `dt=2024-01-01` or `dt=2024-01-01/ub=3`). */
  final case class CompactionResult(partition: String, filesBefore: Int, filesAfter: Int, rows: Long)

  private def rmRec(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmRec)); f.delete()
  }

  /** The directories that directly hold parquet files — one per LEAF
    * partition, so the `dt=`-only and the `dt=`/`ub=` bucketed layouts both
    * compact correctly (rewriting a leaf in place never folds inferred
    * partition columns into the data files). */
  private def leafDirs(d: java.io.File): Seq[java.io.File] = {
    val children = Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
    val subs = children.filter(c => c.isDirectory && !c.getName.startsWith("."))
    if (subs.isEmpty) Seq(d) else subs.flatMap(leafDirs)
  }

  /** Small-files compaction for the partitioned parquet store: an
    * incremental writer (hourly crawl drops, streaming sinks) accumulates
    * many tiny files per partition, and at corpus scale file-open overhead
    * plus driver file listing dominate scans long before data volume does.
    * Each fragmented LEAF partition (dt= or dt=/ub=) is rewritten into
    * ceil(rows / rowsPerFile) files.
    *
    * Protocol per partition: rewrite into `.compact_tmp`, VALIDATE the
    * rewrite's row count against the source before anything is touched,
    * rename the original into `.compact_trash`, rename the rewrite in, then
    * drop the trash. The original is therefore never deleted until a
    * verified replacement is in place, and a crash between the two renames
    * is repaired by the recovery sweep at the START of the next compact()
    * (any trash entry whose live partition is missing is moved back; stale
    * tmp/trash from completed swaps is cleared). Honest caveat: between the
    * two renames the partition is briefly ABSENT — a concurrent reader doing
    * partition discovery in that window misses that day, so schedule
    * compaction off-peak; a catalog-backed table (Iceberg
    * rewrite_data_files) swaps atomically and removes the window. */
  def compact(
      spark: SparkSession,
      path: String,
      rowsPerFile: Long = 1000000L,
      partitions: Seq[String] = Nil
  ): Seq[CompactionResult] = {
    require(rowsPerFile >= 1, "rowsPerFile must be >= 1")
    val root = new java.io.File(path)
    require(root.isDirectory, s"store path does not exist: $path")
    // recovery sweep: repair any interrupted swap before doing new work
    val trashRoot = new java.io.File(root, ".compact_trash")
    leafDirs(trashRoot).filter(_ != trashRoot).foreach { t =>
      val rel = trashRoot.toPath.relativize(t.toPath).toString
      val live = new java.io.File(root, rel)
      if (!live.exists()) {
        live.getParentFile.mkdirs()
        java.nio.file.Files.move(t.toPath, live.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    }
    rmRec(trashRoot)
    rmRec(new java.io.File(root, ".compact_tmp"))

    val targets: Seq[String] =
      if (partitions.nonEmpty) {
        partitions.foreach(p => require(new java.io.File(root, p).isDirectory,
          s"no such partition under $path: $p"))
        partitions.flatMap(p => leafDirs(new java.io.File(root, p)))
          .map(d => root.toPath.relativize(d.toPath).toString).sorted
      } else
        leafDirs(root).filter(_ != root)
          .map(d => root.toPath.relativize(d.toPath).toString).sorted
    targets.flatMap { part =>
      val dir = new java.io.File(root, part)
      val dataFiles = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
        .filter(_.getName.endsWith(".parquet"))
      val df = spark.read.parquet(dir.getPath)
      val rows = df.count()
      val want = math.max(1L, (rows + rowsPerFile - 1) / rowsPerFile).toInt
      if (dataFiles.size <= want) None
      else {
        val tmp = new java.io.File(root, s".compact_tmp/$part")
        df.repartition(want).write.mode(SaveMode.Overwrite).parquet(tmp.getPath)
        val rewritten = spark.read.parquet(tmp.getPath).count()
        require(rewritten == rows,
          s"compaction of $part rewrote $rewritten rows, expected $rows — original left untouched")
        val trash = new java.io.File(root, s".compact_trash/$part")
        rmRec(trash) // stale entry from a completed historical swap
        trash.getParentFile.mkdirs()
        java.nio.file.Files.move(dir.toPath, trash.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        java.nio.file.Files.move(tmp.toPath, dir.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        rmRec(trash)
        val after = dir.listFiles().count(_.getName.endsWith(".parquet"))
        Some(CompactionResult(part, dataFiles.size, after, rows))
      }
    }
  }

  /** The pages schema for schema-on-read sources. */
  val pagesSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("url", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("warc_ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("html", org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType)))

  /** Additional source formats: the same pages shape from JSON-lines or CSV
    * exports (html carried base64 in text formats — decoded on read). All
    * readers converge on the canonical schema, so every downstream operator
    * is source-agnostic. */
  def readPagesJson(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(pagesSchema.copy(fields = pagesSchema.fields.map(f =>
        if (f.name == "html") f.copy(dataType = org.apache.spark.sql.types.StringType) else f)))
      .json(path)
      .withColumn("html", unbase64(col("html")))
      .select("url", "warc_ts", "html", "text", "lang")

  def readPagesCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      // Spark CSV trims whitespace by default — that silently breaks the
      // byte-identity-per-url invariant (caught by the digest round-trip test)
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .schema(pagesSchema.copy(fields = pagesSchema.fields.map(f =>
        if (f.name == "html") f.copy(dataType = org.apache.spark.sql.types.StringType) else f)))
      .csv(path)
      .withColumn("html", unbase64(col("html")))
      .select("url", "warc_ts", "html", "text", "lang")

  /** Export helpers for the text formats (html base64-encoded). */
  def writePagesJson(df: DataFrame, path: String): Unit =
    df.withColumn("html", base64(col("html")))
      .write.mode(SaveMode.Overwrite).json(path)

  def writePagesCsv(df: DataFrame, path: String): Unit =
    df.withColumn("html", base64(col("html")))
      .write.mode(SaveMode.Overwrite)
      .option("header", "true").option("escape", "\"")
      // the CSV WRITER also trims by default — same byte-identity hazard
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
}
