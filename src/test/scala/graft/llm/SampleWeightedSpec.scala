package graft.llm

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Min-of-w-hashes weighted sampling ([[LlmQueries
  * .sampleWeightedOf]]): the key must equal an INDEPENDENT JVM
  * recomputation (MessageDigest, not Spark's md5), weight tiers must
  * be over-represented monotonically on a large corpus, and the
  * sample must be a pure function of (doc_id, weight) — stable
  * under re-partitioning. */
class SampleWeightedSpec extends AnyFunSuite {

  private val s = TestSpark.spark
  import s.implicits._

  private def jvmKey(docId: Long, w: Int): Long =
    (1 to w).map { r =>
      val hex = MessageDigest.getInstance("MD5")
        .digest(s"$docId:$r".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }.min

  private def corpus(n: Int) =
    (1L to n.toLong).map(i => (i, s"src${i % 3}", (i % 4 + 1).toInt))
      .toDF("doc_id", "source", "weight")

  test("keys match an independent JVM MessageDigest recomputation") {
    val got = LlmQueries.sampleWeightedOf(corpus(50), 50)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (id, w, k) => assert(k == jvmKey(id, w)) }
    // and the output really is sorted by (key, doc_id)
    val keys = got.map(r => (r._3, r._1)).toSeq
    assert(keys == keys.sorted)
  }

  test("higher tiers are over-represented, monotonically") {
    // 4000 docs, 1000 per tier, top 400: uniform would give 100
    // per tier; expect counts increasing in weight (tier 4 picks a
    // min of 4 draws — ~4x tier 1's win rate)
    val byTier = LlmQueries.sampleWeightedOf(corpus(4000), 400)
      .groupBy("weight").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byTier(1) < byTier(2) && byTier(2) < byTier(3) &&
      byTier(3) < byTier(4), s"tiers: $byTier")
    assert(byTier(4) > 2 * byTier(1), s"tiers: $byTier")
  }

  test("stable under re-partitioning (a pure function of the row)") {
    val base = LlmQueries.sampleWeightedOf(corpus(500), 40)
      .collect().map(_.toSeq).toSeq
    val shuffled = LlmQueries
      .sampleWeightedOf(corpus(500).repartition(13), 40)
      .collect().map(_.toSeq).toSeq
    assert(base == shuffled)
  }
}
