package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, key) materialization cache for per-corpus-snapshot
  * artifacts (LSH pair tables, converged CC labels, derived fixture
  * tables). Sessions are WEAK keys: a stopped/dereferenced session's
  * entries (and the DataFrames pinning its checkpointed blocks)
  * become collectable instead of living for the JVM lifetime. Keys
  * name one corpus *snapshot* (an input dir); rewriting a dir
  * in-place within one session is out of contract — the same rule as
  * any materialized pipeline artifact. */
object SnapshotMemo {
  private val bySession = new java.util.WeakHashMap[SparkSession,
    java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def getOrCompute(s: SparkSession, key: String)
      (compute: => DataFrame): DataFrame = {
    val m = bySession.synchronized {
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
