package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The banded SimHash near-dup's recall GUARANTEE: with 4 bands over
  * 64 bits, a pair within hamming distance 3 can corrupt at most 3
  * bands, so at least one band agrees exactly — banding is a
  * pigeonhole certainty, not an approximation. The spec proves it
  * empirically: banded pairs == brute-force all-pairs at the
  * threshold on the real corpus. */
class SimhashNeardupSpec extends AnyFunSuite {

  test("banded candidates find EXACTLY the all-pairs hamming<=3 set " +
    "on the real sf0.001 corpus (recall 1 by pigeonhole)") {
    val s = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    val banded = LlmQueries.queries("llm_simhash_neardup")(s, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // brute force: all 500×499/2 signature pairs, no banding (the
    // banded run above already materialized the signature memo);
    // signatures are 4 × 16-bit band integers
    val sigs = graft.SnapshotMemo
      .getOrCompute(s, s"simhash64:$d")(sys.error("must be memoized"))
      .collect().map(r => (r.getLong(0),
        (1 to 4).map(k => r.getLong(k)).toVector))
    val brute = (for {
      (ia, va) <- sigs
      (ib, vb) <- sigs
      if ia < ib
      h = va.zip(vb).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum
      if h <= 3
    } yield (ia, ib, h.toLong)).toSet
    assert(banded == brute && banded.nonEmpty)
  }
}
