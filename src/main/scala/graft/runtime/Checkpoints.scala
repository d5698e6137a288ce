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

  /** Minimal JSON reader for the checkpoint shape written above. */
  def fromJson(json: String): FittedSelector = {
    def str(key: String): String = {
      val m = ("\"" + key + "\":\"((?:[^\"\\\\]|\\\\.)*)\"").r.findFirstMatchIn(json)
      m.map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).getOrElse("")
    }
    def obj(key: String): String = {
      val start = json.indexOf("\"" + key + "\":{")
      val open = json.indexOf('{', start + key.length + 3)
      var depth = 0; var i = open
      while ({ val c = json(i); if (c == '{') depth += 1 else if (c == '}') depth -= 1; depth > 0 }) i += 1
      json.substring(open + 1, i)
    }
    def arr(key: String): Seq[String] = {
      val start = json.indexOf("\"" + key + "\":[")
      val open = json.indexOf('[', start)
      val close = json.indexOf(']', open)
      val body = json.substring(open + 1, close)
      if (body.trim.isEmpty) Nil
      else body.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")
        .replace("\\\"", "\"").replace("\\\\", "\\"))
    }
    val scorePairs = {
      val body = obj("scores")
      if (body.trim.isEmpty) Nil
      else body.split(",(?=\")").toSeq.map { kv =>
        val i = kv.lastIndexOf(':')
        val k = kv.take(i).trim.stripPrefix("\"").stripSuffix("\"")
          .replace("\\\"", "\"").replace("\\\\", "\\")
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
      val fitted =
        if (Files.exists(path)) fromJson(Files.readString(path))
        else {
          val f = step.fit(cur, outcome, preds)
          write(path, toJson(f, lineage))
          f
        }
      cur = fitted.transform(cur)
      fitted
    }
  }
}
