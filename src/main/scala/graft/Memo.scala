package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, key) materialization cache for per-corpus-snapshot
  * artifacts (LSH pair tables, MinHash signatures, converged CC
  * labels, derived fixture tables).
  *
  * Lifecycle: entries for STOPPED sessions are evicted on the next
  * access of any kind — a stopped session's checkpointed blocks died
  * with its context, so the cached DataFrames are dead weight. (A
  * WeakHashMap would not work here: the cached DataFrames strongly
  * reference their session through QueryExecution, which is exactly
  * the value→key strong path its javadoc warns makes entries
  * uncollectable.) Keys name one corpus *snapshot* (an input dir);
  * rewriting a dir in-place within one session is out of contract —
  * the same rule as any materialized pipeline artifact. */
object SnapshotMemo {
  private val bySession = new java.util.HashMap[SparkSession,
    java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def getOrCompute(s: SparkSession, key: String)
      (compute: => DataFrame): DataFrame = {
    val m = bySession.synchronized {
      val it = bySession.entrySet().iterator()
      while (it.hasNext) {
        if (it.next().getKey.sparkContext.isStopped) it.remove()
      }
      var inner = bySession.get(s)
      if (inner == null) {
        inner =
          new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        bySession.put(s, inner)
      }
      inner
    }
    // NOT computeIfAbsent: memoized artifacts nest (CC labels → pair
    // table → signature table), and a compute function that touches
    // the same ConcurrentHashMap throws "Recursive update" whenever
    // the keys land in the same bin. Plain get/putIfAbsent allows the
    // nesting; a rare race just computes the artifact twice.
    val cached = m.get(key)
    if (cached != null) cached
    else {
      val computed = compute
      val prev = m.putIfAbsent(key, computed)
      if (prev != null) prev else computed
    }
  }
}
