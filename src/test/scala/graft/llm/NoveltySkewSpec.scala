package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Adversarial skew corpus for the novelty signal: EVERY document
  * shares one dominant boilerplate shingle. The former
  * window-partitioned-by-hash plan would route the dominant
  * shingle's whole row set to a single reducer; the two-phase hash
  * aggregate collapses it map-side. The spec pins both the values on
  * the degenerate corpus and the plan shape (no Window operator —
  * the skew surface is gone structurally, not tuned around). */
class NoveltySkewSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  private def toks(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("w"))

  test("one-dominant-shingle corpus: every doc keeps its unique tail " +
      "and shares the boilerplate head") {
    val docs = (1L to 200L).map(i =>
      i -> s"the boiler plate u${i}a u${i}b u${i}c")
    val out = LlmQueries.noveltyOf(toks(docs)).collect()
    assert(out.length === 200)
    // per doc: 4 shingles, the (the,boiler,plate) one shared by all
    // 200 docs, the other 3 carry doc-unique tokens
    out.foreach { r =>
      assert(r.getAs[Long]("n_shingles") === 4)
      assert(r.getAs[Long]("n_unique") === 3)
      assert(r.getAs[Long]("novelty_x1000") === 750)
    }
  }

  test("a fully-duplicated document scores zero novelty (left-join " +
      "coalesce path)") {
    val docs = Seq(
      1L -> "alpha beta gamma delta",
      2L -> "alpha beta gamma delta",
      3L -> "epsilon zeta eta theta")
    val out = LlmQueries.noveltyOf(toks(docs)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_unique"), r.getAs[Long]("novelty_x1000"))).toMap
    assert(out(1L) === ((0L, 0L)))
    assert(out(2L) === ((0L, 0L)))
    assert(out(3L) === ((2L, 1000L)))
  }

  test("the novelty plan carries no Window operator (doc frequency is " +
      "a combine-collapsed aggregate, not window state)") {
    val df = LlmQueries.noveltyOf(toks(Seq(1L -> "a b c d")))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"),
      s"novelty regressed to a window plan:\n$plan")
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("partial_count") || phys.contains("count"),
      "expected an aggregate-based doc-frequency")
  }
}
