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

  /** Inverse of [[esc]]: the full escape set esc can emit (plus \r \t for
    * safety) — a naive replace-chain would miss \n and \uXXXX. */
  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case '"'  => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'n'  => sb += '\n'; i += 2
          case 'r'  => sb += '\r'; i += 2
          case 't'  => sb += '\t'; i += 2
          case 'u'  => sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case o    => sb += o; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Split an array/object body on TOP-LEVEL commas only — a comma inside a
    * string literal (e.g. check_top_p's "(1, n)" warning, or a column named
    * "a,b") must not split the element; a naive split corrupted resumed
    * warnings/excluded lists. */
  private def splitTop(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var inStr = false
    var i = 0
    while (i < body.length) {
      val c = body(i)
      if (inStr) {
        sb += c
        if (c == '\\' && i + 1 < body.length) { sb += body(i + 1); i += 1 }
        else if (c == '"') inStr = false
      } else if (c == '"') { inStr = true; sb += c }
      else if (c == ',') { out += sb.toString; sb.clear() }
      else sb += c
      i += 1
    }
    if (sb.nonEmpty) out += sb.toString
    out.result()
  }

  private def stripQuotes(s: String): String =
    unesc(s.trim.stripPrefix("\"").stripSuffix("\""))

  /** Minimal JSON reader for the checkpoint shape written above. */
  def fromJson(json: String): FittedSelector = {
    def str(key: String): String = {
      val m = ("\"" + key + "\":\"((?:[^\"\\\\]|\\\\.)*)\"").r.findFirstMatchIn(json)
      m.map(g => unesc(g.group(1))).getOrElse("")
    }
    def obj(key: String): String = {
      val start = json.indexOf("\"" + key + "\":{")
      val open = json.indexOf('{', start + key.length + 3)
      // depth scan must be string-aware: a brace inside a feature-name key
      // would otherwise truncate or overrun the object body
      var depth = 0; var i = open; var inStr = false
      while ({
        val c = json(i)
        if (inStr) {
          if (c == '\\') i += 1
          else if (c == '"') inStr = false
        } else if (c == '"') inStr = true
        else if (c == '{') depth += 1
        else if (c == '}') depth -= 1
        depth > 0
      }) i += 1
      json.substring(open + 1, i)
    }
    def arr(key: String): Seq[String] = {
      val start = json.indexOf("\"" + key + "\":[")
      val open = json.indexOf('[', start)
      // the close bracket must also be found string-aware: scan forward
      var i = open + 1; var inStr = false
      while (i < json.length && (inStr || json(i) != ']')) {
        val c = json(i)
        if (inStr) {
          if (c == '\\') i += 1
          else if (c == '"') inStr = false
        } else if (c == '"') inStr = true
        i += 1
      }
      val body = json.substring(open + 1, i)
      if (body.trim.isEmpty) Nil else splitTop(body).map(stripQuotes)
    }
    val scorePairs = {
      val body = obj("scores")
      if (body.trim.isEmpty) Nil
      else splitTop(body).map { kv =>
        val i = kv.lastIndexOf(':')
        val k = stripQuotes(kv.take(i))
        val v = kv.drop(i + 1).trim
        k -> (if (v == "null") None else Some(v.toDouble))
      }
    }
    FittedSelector(str("step"), str("outcome"), scorePairs, arr("excluded"), arr("warnings"))
  }

  private def write(path: Path, content: String): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
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
