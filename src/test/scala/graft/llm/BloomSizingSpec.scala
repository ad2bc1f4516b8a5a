package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Data-derived Bloom geometry + the non-broadcast probe fallback:
  * sizing follows the standard m/k formulas, a non-default geometry
  * still admits every exact contamination hit, and the partitioned
  * probe matches the broadcast path bit-for-bit without any
  * broadcast exchange. */
class BloomSizingSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("derived geometry follows the standard formulas") {
    // n=1000, p=1%: m = ceil(1000·ln(100)/ln²2) = 9586 bits,
    // 155 62-bit words, k = round(ln2·9586/1000) = 7
    val p1 = LlmQueries.deriveBloomParams(1000L, 100)
    assert(p1 == LlmQueries.BloomParams(155, 7))
    assert(p1.bits == 155L * 62)
    // n=1M, p=1-in-8: m = ceil(1e6·ln8/ln²2) = 4328085 bits -> 69808
    // words, k = 3
    assert(LlmQueries.deriveBloomParams(1000000L, 8) ==
      LlmQueries.BloomParams(69808, 3))
    // k clamps: tiny bits-per-key floors at 1, huge caps at 8
    assert(LlmQueries.deriveBloomParams(1000000L, 2).k >= 1)
    assert(LlmQueries.deriveBloomParams(10L, 1000000000).k == 8)
  }

  test("a derived non-default geometry has no false negatives and a " +
    "bitset of the derived width") {
    val s = TestSpark.spark
    val heldout = LlmQueries.fivegrams(s, dir)
      .filter(col("doc_id") % 97 === 0).select(col("g")).distinct()
    val p = LlmQueries.deriveBloomParams(heldout, 100)
    assert(p != LlmQueries.defaultBloom) // genuinely non-default
    val barr = LlmQueries.bloomBitsetOf(heldout, p).head.getSeq[Long](0)
    assert(barr.length == p.words)
    // probe at the derived geometry via the partitioned path
    val flagged = LlmQueries.computeBloomFlaggedPartitioned(s, dir, p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = LlmQueries.decontaminate(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(exact.nonEmpty)
    exact.foreach { case (id, n) =>
      assert(flagged.contains(id), s"doc $id exact-hit but not flagged")
      assert(flagged(id) >= n, s"doc $id bloom-undercounts")
    }
    // the 1-in-100 target governs the PER-GRAM false-positive rate
    // (doc-level flagging compounds it over ~50 grams/doc, so most
    // docs can be flagged while the filter still meets its contract):
    // measured FP gram pairs / probed gram pairs must sit near 1%
    val probedPairs = LlmQueries.fivegrams(s, dir)
      .filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("g")).distinct().count()
    val fpPairs = flagged.values.sum - exact.values.sum
    val rate = fpPairs.toDouble / probedPairs
    assert(rate < 0.03, f"gram-level FP rate $rate%.4f vs 0.01 target")
  }

  test("the row-local gate reads its geometry FROM the bitset: a " +
    "derived non-default bitset drops every exactly-contaminated doc") {
    val s = TestSpark.spark
    val heldout = LlmQueries.fivegrams(s, dir)
      .filter(col("doc_id") % 97 === 0).select(col("g")).distinct()
    val p = LlmQueries.deriveBloomParams(heldout, 100)
    assert(p != LlmQueries.defaultBloom)
    // note: NO geometry passed to the gate — it must come from the row
    val bits = LlmQueries.bloomBitsetOf(heldout, p)
    val train = s.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 97 =!= 0)
    val keptIds = LlmQueries.bloomCleanOf(train, bits)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exactBad = LlmQueries.decontaminate(s, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exactBad.nonEmpty)
    // no false negatives: a contaminated doc can never survive the gate
    assert(exactBad.intersect(keptIds).isEmpty,
      s"contaminated docs passed the gate: ${exactBad.intersect(keptIds)}")
    assert(keptIds.nonEmpty)
  }

  test("bloom merge == bitset of the union, bit for bit; geometry " +
    "mismatch raises") {
    val s = TestSpark.spark
    val s2 = s
    import s2.implicits._
    def gramsOf(xs: Seq[String]) = xs.toDF("g")
    val g1 = Seq("alpha beta gamma delta epsilon", "one two three four five")
    val g2 = Seq("zeta eta theta iota kappa", "one two three four five")
    val p = LlmQueries.BloomParams(40, 4)
    def bits(df: org.apache.spark.sql.DataFrame) =
      LlmQueries.bloomBitsetOf(df, p)
    val merged = LlmQueries.bloomMergeOf(bits(gramsOf(g1)), bits(gramsOf(g2)))
      .head
    val union = bits(gramsOf((g1 ++ g2).distinct)).head
    assert(merged.getSeq[Long](0) == union.getSeq[Long](0))
    assert(merged.getInt(1) == p.k)
    // mismatched geometry must raise, not probe garbage
    val other = LlmQueries.bloomBitsetOf(gramsOf(g2),
      LlmQueries.BloomParams(40, 3))
    val ex = intercept[Exception] {
      LlmQueries.bloomMergeOf(bits(gramsOf(g1)), other).collect()
    }
    assert(ex.getMessage.contains("bloom geometry mismatch") ||
      Option(ex.getCause).exists(_.getMessage
        .contains("bloom geometry mismatch")))
  }

  test("partitioned probe == broadcast probe at the default geometry, " +
    "with no broadcast exchange in its plan") {
    val s = TestSpark.spark
    val adaptiveBcast = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val prevAdaptive = s.conf.getOption(adaptiveBcast)
    try {
      s.conf.set(adaptiveBcast, "-1")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = LlmQueries.computeBloomFlaggedPartitioned(s, dir)
      val viaPartitioned = df.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaBroadcast = LlmQueries.computeBloomFlagged(s, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaPartitioned == viaBroadcast && viaPartitioned.nonEmpty)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"partitioned probe still broadcasts:\n$plan")
      assert(plan.contains("ShuffledHashJoin"), plan)
    } finally {
      prevAdaptive match {
        case Some(v) => s.conf.set(adaptiveBcast, v)
        case None => s.conf.unset(adaptiveBcast)
      }
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
