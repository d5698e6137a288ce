package graft.runtime

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession

import graft.select.{FittedSelector, SelectorStep}

/** Commit-level per-step checkpoints so a killed fit resumes EXACTLY
  * (north_rule: "resumable from checkpoint with per-partition lineage +
  * metrics"). A fitted step's entire state is O(#features) — scores +
  * excluded names — so the checkpoint is a small JSON document written
  * atomically (temp file + move) under `<dir>/step_<i>_<name>.json`.
  *
  * Resume contract: `fitOrResume` replays completed steps from their
  * checkpoints (byte-identical state — no recompute, no drift) and runs the
  * remaining ones, so fit(k steps) interrupted after j steps redoes only
  * k − j. An `input_lineage` field records what the step was fitted on.
  */
object Checkpoints {

  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def toJson(f: FittedSelector, lineage: String): String = {
    val scores = f.scores.map {
      case (k, Some(v)) => s""""${esc(k)}":$v"""
      case (k, None)    => s""""${esc(k)}":null"""
    }.mkString("{", ",", "}")
    val excluded = f.excluded.map(e => s""""${esc(e)}"""").mkString("[", ",", "]")
    val warnings = f.warnings.map(w => s""""${esc(w)}"""").mkString("[", ",", "]")
    s"""{"step":"${esc(f.step)}","outcome":"${esc(f.outcome)}","scores":$scores,""" +
      s""""excluded":$excluded,"warnings":$warnings,"input_lineage":"${esc(lineage)}"}"""
  }

  /** Reader for the checkpoint shape written above, on the json4s parser
    * that ships with Spark — a hand-rolled scanner here went through two
    * rounds of escaping/nesting fixes and still risked fabricating state on
    * truncated input. json4s throws on malformed JSON, which is exactly
    * what [[fitOrResume]]'s refit fallback needs; missing keys throw too
    * (a half-written document must never resume as empty state). */
  def fromJson(json: String): FittedSelector = {
    import org.json4s._
    val ast = org.json4s.jackson.JsonMethods.parse(json)
    def fail(what: String): Nothing =
      throw new IllegalArgumentException(s"corrupt checkpoint: $what in $json")
    def str(key: String): String = ast \ key match {
      case JString(v) => v
      case _          => fail(s"missing string `$key`")
    }
    def arr(key: String): Seq[String] = ast \ key match {
      case JArray(xs) => xs.map { case JString(v) => v; case other => fail(s"non-string in `$key`: $other") }
      case _          => fail(s"missing array `$key`")
    }
    val scores = ast \ "scores" match {
      case JObject(fields) => fields.map { case (k, v) =>
        k -> (v match {
          case JNull        => None
          case JDouble(d)   => Some(d)
          case JInt(i)      => Some(i.toDouble)
          case JDecimal(d)  => Some(d.toDouble)
          case JLong(l)     => Some(l.toDouble)
          case other        => fail(s"non-numeric score for `$k`: $other")
        })
      }
      case _ => fail("missing object `scores`")
    }
    FittedSelector(str("step"), str("outcome"), scores, arr("excluded"), arr("warnings"))
  }

  private def write(path: Path, content: String): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Checkpoint-store GC: under `<root>/<pipelineId>` each fit owns one
    * subdirectory of step JSONs (the layout fitOrResume is pointed at, one
    * dir per fit). Keeps the `keepLatest` most-recent fits (directory mtime,
    * name tiebreak) and deletes the rest — a multi-day run re-fitting on a
    * schedule otherwise accumulates unbounded (if individually tiny) JSON.
    * Returns the deleted fit directories.
    *
    * `graceMillis` protects in-flight fits: a fit modified within the grace
    * window is never evicted regardless of rank. "Modified" is the MAX mtime
    * of the fit directory and its contained step files — overwriting an
    * existing step JSON updates the file's mtime but not necessarily the
    * parent directory's, so a long resumed fit that rewrites rather than
    * creates step files would look stale under the bare directory mtime.
    * A SLOW fit can still look stale (its max mtime is its last step-file
    * write while a long step computes), so when scheduled fits may overlap,
    * set the grace above the longest plausible single-step duration; mtime
    * order alone cannot distinguish "slow and running" from "old and dead".
    */
  def gc(
      root: String,
      pipelineId: String,
      keepLatest: Int,
      graceMillis: Long = 3600L * 1000
  ): Seq[String] = {
    require(keepLatest >= 1, "keepLatest must be >= 1")
    require(graceMillis >= 0, "graceMillis must be >= 0")
    val cutoff = System.currentTimeMillis() - graceMillis
    val base = Paths.get(root, pipelineId)
    if (!Files.isDirectory(base)) return Nil
    val children = {
      val s = Files.list(base)
      try {
        val it = s.iterator()
        val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
        while (it.hasNext) buf += it.next()
        buf.toSeq
      } finally s.close()
    }
    // a fit's effective mtime = max over the directory and its step files
    // (fits hold a handful of JSONs, so the listing is cheap)
    def fitMtime(p: Path): Long = {
      var m = Files.getLastModifiedTime(p).toMillis
      val s = Files.list(p)
      try {
        val it = s.iterator()
        while (it.hasNext) m = math.max(m, Files.getLastModifiedTime(it.next()).toMillis)
      } finally s.close()
      m
    }
    val fits = children.filter(Files.isDirectory(_))
      .map(p => (p, fitMtime(p)))
      .sortBy { case (p, m) => (m, p.getFileName.toString) }
    val evict = fits.dropRight(keepLatest)
      .collect { case (p, m) if m < cutoff => p }
    evict.foreach { d =>
      val w = Files.walk(d)
      try {
        val all = {
          val it = w.iterator(); val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
          while (it.hasNext) buf += it.next()
          buf.toSeq
        }
        all.sortBy(-_.getNameCount).foreach(Files.delete)
      } finally w.close()
    }
    evict.map(_.toString)
  }

  /** Fit a pipeline with per-step checkpointing; completed steps are loaded
    * from `dir` instead of recomputed. */
  def fitOrResume(
      spark: SparkSession,
      dir: String,
      steps: Seq[(SelectorStep, Seq[String])],
      df: org.apache.spark.sql.DataFrame,
      outcome: String,
      lineage: String = ""
  ): Seq[FittedSelector] = {
    var cur = df
    steps.zipWithIndex.map { case ((step, preds), i) =>
      val path = Paths.get(dir, f"step_$i%03d_${step.name}.json")
      def refit(): FittedSelector = {
        val f = step.fit(cur, outcome, preds)
        write(path, toJson(f, lineage))
        f
      }
      val fitted =
        if (Files.exists(path))
          // a corrupt/truncated checkpoint (disk-full mid-escape, partial
          // write outside the atomic path) falls back to refitting the step
          // rather than aborting the whole resume
          scala.util.Try(fromJson(Files.readString(path))).getOrElse(refit())
        else refit()
      cur = fitted.transform(cur)
      fitted
    }
  }
}
