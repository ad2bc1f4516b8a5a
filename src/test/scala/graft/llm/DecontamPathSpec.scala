package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The decontamination fallback contract: when the heldout set is
  * declared too big to broadcast
  * (`spark.graft.decontam.broadcastHeldout=false`), the heldout join
  * plans as a hash-partitioned shuffle join — no broadcast exchange
  * anywhere in the plan, nothing collected driver-side — and the
  * flagged-doc table is identical to the broadcast path's. */
class DecontamPathSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("shuffle-hash fallback: same flags, no broadcast in the plan") {
    val s = TestSpark.spark
    val adaptiveBcast = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val prevAdaptive = s.conf.getOption(adaptiveBcast)
    def flags(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val viaBroadcast = flags(LlmQueries.decontaminate(s, dir))
    try {
      s.conf.set(LlmQueries.decontamBroadcastFlag, "false")
      // pin AQE too: the spec asserts the fallback never NEEDS a
      // broadcast, so forbid the runtime small-side conversion
      s.conf.set(adaptiveBcast, "-1")
      val df = LlmQueries.computeDecontaminate(s, dir)
      val viaShuffle = flags(df)
      assert(viaShuffle == viaBroadcast && viaShuffle.nonEmpty)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"fallback path still broadcasts:\n$plan")
      assert(plan.contains("ShuffledHashJoin"), plan)
    } finally {
      s.conf.unset(LlmQueries.decontamBroadcastFlag)
      prevAdaptive match {
        case Some(v) => s.conf.set(adaptiveBcast, v)
        case None => s.conf.unset(adaptiveBcast)
      }
    }
  }

  test("bloom prefilter: superset of the exact flags (no false " +
      "negatives), full per-doc counts, consistent summary") {
    val s = TestSpark.spark
    val bloom = LlmQueries.decontamBloom(s, dir).collect()
    val bmap = bloom
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val exact = LlmQueries.decontaminate(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(exact.nonEmpty)
    // structural no-false-negatives: every exactly-contaminated doc
    // is bloom-flagged, its exact count rides along unchanged, and
    // bloom can only overcount
    exact.foreach { case (id, n) =>
      assert(bmap.contains(id), s"doc $id exact-hit but not flagged")
      assert(bmap(id)._2 == n)
      assert(bmap(id)._1 >= n)
    }
    val sm = LlmQueries.bloomSummary(s, dir).collect().head
    assert(sm.getLong(0) == bloom.length.toLong)
    assert(sm.getLong(1) + sm.getLong(2) == sm.getLong(0))
    assert(sm.getLong(1) == exact.size.toLong)
    assert(sm.getLong(3) >= sm.getLong(4))
  }

  test("row-local bloom gate partitions the train corpus exactly " +
      "along the flagged-doc table") {
    val s = TestSpark.spark
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables(s, dir, "documents")
    val clean = LlmQueries
      .bloomCleanOf(docs, LlmQueries.bloomBitset(s, dir))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val flagged = LlmQueries.decontamBloom(s, dir)
      .collect().map(_.getLong(0)).toSet
    val train = docs.filter(col("doc_id") % 97 =!= 0)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // same grams, same bitset, two evaluation shapes (exploded
    // per-gram probe vs row-local exists) — they must agree doc for
    // doc on the train side
    assert((clean & flagged).isEmpty)
    assert(((clean | flagged) & train) == train)
  }
}
