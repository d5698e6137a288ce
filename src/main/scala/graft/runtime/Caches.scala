package graft.runtime

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame

/** Lifetime hook for the internal caches that candidate-generation
  * operators leave persisted.
  *
  * `Dedup.jaccardPairs` / `minHashCandidates` / `simHashCandidates` and
  * `Similarity.cosineNearDupPairs` must cache an intermediate table (both
  * sides of their bucket self-join re-execute the whole upstream subtree
  * otherwise — Catalyst shares no re-referenced subtree), and the DataFrame
  * they RETURN is lazy and depends on that cache, so the operator cannot
  * `try/finally unpersist` the way the selector steps do (those consume
  * their caches internally, e.g. Steps.scala FcbfStep). Without a hook the
  * cache lives until LRU eviction — survivable for a one-shot job, but a
  * long-lived session making repeated dedup calls accumulates pinned RDDs.
  *
  * Callers pass a handle, consume the returned DataFrame, then `release()`:
  *
  * {{{
  * val h = new CacheHandle
  * try Dedup.jaccardPairs(df, "id", "text", 3, 0.8, handle = h).write.parquet(out)
  * finally h.release()
  * }}}
  *
  * The default argument (a fresh throwaway handle) preserves the previous
  * behavior for callers that don't manage lifetimes.
  */
final class CacheHandle {
  private val tracked = ArrayBuffer.empty[DataFrame]
  private val rdds = ArrayBuffer.empty[org.apache.spark.rdd.RDD[_]]

  private[graft] def track(df: DataFrame): DataFrame = {
    synchronized { tracked += df }
    df
  }

  /** Track a LAZY `localCheckpoint(eager = false)` result. Its persisted
    * state is an RDD, not a CacheManager entry, so `Dataset.unpersist`
    * cannot release it — the underlying RDD is captured from the
    * checkpoint's `LogicalRDD` leaf and unpersisted at `release()`.
    * (Iterative operators checkpoint each step because a lazily CACHED
    * step chain is a driver hazard: nested `InMemoryRelation`s re-render
    * the whole plan string per AQE event — measured 86 s of pure driver
    * `generateTreeString` burn on q_hits — while `LogicalRDD` is an
    * opaque leaf.) */
  private[graft] def trackCheckpointed(df: DataFrame): DataFrame = {
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        synchronized { rdds += l.rdd }
      case _ => () // not a checkpoint leaf — nothing persists, nothing to free
    }
    df
  }

  /** Unpersist every tracked cache. Blocking by default so callers (and the
    * RuntimeSpec hygiene assertion) observe empty storage immediately.
    * Idempotent; the handle is reusable afterwards. */
  def release(blocking: Boolean = true): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking))
    tracked.clear()
    rdds.foreach(_.unpersist(blocking))
    rdds.clear()
  }
}
