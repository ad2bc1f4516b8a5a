package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SemDeDup-shaped semantic dedup: cluster-local representative
  * gating with exact integer cosine — verdict invariants, stats
  * consistency, and the no-self-join plan shape. */
class SemDedupSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("representatives are always kept; drops stay in-cluster; " +
    "stats agree with verdicts") {
    val s = TestSpark.spark
    val rows = LlmQueries.semanticDedup(s, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    // every cluster's rep is kept and is its own rep
    rows.filter(r => r._1 == r._3).foreach(r => assert(r._4 == "kept"))
    // the rep of every row is the min vec_id of its cluster
    val minByCluster = rows.groupBy(_._2).map { case (c, rs) =>
      c -> rs.map(_._1).min }
    rows.foreach(r => assert(r._3 == minByCluster(r._2)))
    // the gate actually drops something on this corpus (measured
    // τ=0.30 behavior, see semDedupT2)
    val dropped = rows.count(_._4 == "dropped")
    assert(dropped > 0 && dropped < rows.length)
    // stats roll up the verdicts exactly
    val stats = LlmQueries.semdedupStats(s, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.groupBy(_._2).foreach { case (c, rs) =>
      val (n, d) = stats(c)
      assert(n == rs.length && d == rs.count(_._4 == "dropped"))
    }
  }

  test("plan: corpus streams past broadcast reps — no corpus-scale " +
    "self-join, no sort-merge exchange on the embedding table") {
    val s = TestSpark.spark
    val plan = LlmQueries.semanticDedup(s, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
