package graft

import java.nio.file.{Files, Paths}

import graft.core.GraftSession

/** Dump `.explain("formatted")` for registered queries to files — the
  * optimization-round evidence trail (plans/rNN/<query>_{before,after}.txt).
  * Not part of the graded bench/oracle surface.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [nameFilter,names...]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val filter: Option[Seq[String]] =
      if (args.length > 2) Some(args(2).split(',').toSeq) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.get(cpus)
    Files.createDirectories(Paths.get(outDir))
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => filter.forall(_.exists(n.contains)))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plandump] wrote $name")
      } catch {
        case e: Throwable => System.err.println(s"[plandump] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
