package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import graft.core.GraftSession

/** Extra, NON-GRADED benchmarks: noop-sink / operator-level isolation probes
  * (guide §1.4) used to attribute time inside the heavier registered
  * queries. The graded harness is graft.Bench (frozen); numbers from here
  * are cited in OPTIMIZATION notes only.
  *
  * Usage: runMain graft.BenchExtra <probe>[,probe...] [reps]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench.
  */
object BenchExtra {

  private class StageTimes extends SparkListener {
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Long)]
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val ms = for {
        s <- si.submissionTime; c <- si.completionTime
      } yield c - s
      rows += ((si.stageId, si.name.takeWhile(_ != '\n').take(80),
        ms.getOrElse(-1L), si.numTasks.toLong))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val probes = args.headOption.map(_.split(',').toSeq).getOrElse(Seq("spearman"))
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.get(cpus)
    val lst = new StageTimes
    spark.sparkContext.addSparkListener(lst)

    def timed(name: String)(body: => Unit): Unit = {
      for (r <- 1 to reps) {
        lst.rows.clear()
        spark.sparkContext.setJobDescription(s"$name rep $r")
        val t0 = System.nanoTime()
        body
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[extra] $name rep $r: $sec%.2f s")
        if (r == reps) lst.rows.sortBy(-_._3).take(12).foreach { case (id, n, ms, tasks) =>
          println(f"[extra]   stage $id%4d ${ms / 1000.0}%6.2f s  tasks=$tasks%4d  $n")
        }
      }
      spark.sparkContext.setJobDescription(null)
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = () => spark.read.parquet(s"$sfDir/lineitem.parquet")

    probes.foreach {
      case "spearman" => timed("spearman") {
        graft.stats.Correlation.spearman(
          li(), Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice")
      }
      case "spearman_stats_noop" => timed("spearman_stats_noop") {
        val h = new graft.runtime.CacheHandle
        val (stats, _) = graft.stats.Correlation.spearmanStats(
          li(), Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice", h)
        noop(stats)
        h.release(blocking = false)
      }
      case "spearman_explain" =>
        val h = new graft.runtime.CacheHandle
        val (stats, _) = graft.stats.Correlation.spearmanStats(
          li(), Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice", h)
        println(stats.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        h.release(blocking = false)
      case q if q.startsWith("q_") => timed(q) {
        SparkEntry.queries(q)(spark, sfDir).count()
      }
      case other => System.err.println(s"[extra] unknown probe $other")
    }
    spark.stop()
  }
}
