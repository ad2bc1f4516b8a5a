package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** KMV multiset-operation estimation ([[LlmQueries
  * .kmvIntersectOf]]): the Beyer-et-al. estimators must be EXACT in
  * the complete-sketch regime (fewer than k distinct values on both
  * sides — the sketch IS the set), land inside the k = 64 error
  * regime on larger corpora, and agree with the exact-intersection
  * yardstick column that ships in the same row. */
class KmvIntersectSpec extends AnyFunSuite {

  private val s = TestSpark.spark
  import s.implicits._

  /** A doc of `words` so its distinct 3-shingle set is exactly the
    * consecutive windows — one doc per source keeps it countable. */
  private def doc(src: String, words: Seq[String]): (String, String) =
    (src, words.mkString(" "))

  private def run(rows: Seq[(String, String)]) =
    LlmQueries.kmvIntersectOf(rows.toDF("source", "text"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

  test("complete-sketch regime: union, rho and intersection exact") {
    // a: words 0..11 → shingles (0,1,2)..(9,10,11) = 10
    // b: words 6..17 → 10 shingles, overlap = windows 6..9 = 4
    val ws = (0 to 17).map(i => s"w$i")
    val got = run(Seq(doc("a", ws.take(12)), doc("b", ws.drop(6))))
    val (nExact, estU, rho, estI) = got(("a", "b"))
    assert(nExact == 4L)
    assert(estU == 16L)  // 10 + 10 − 4
    assert(rho == 4L)    // merged sketch is the full union
    assert(estI == 4L)   // complete ⇒ exact, not an estimate
  }

  test("disjoint sources: zero intersection, union adds") {
    val got = run(Seq(
      doc("a", (0 to 11).map(i => s"a$i")),
      doc("b", (0 to 11).map(i => s"b$i"))))
    assert(got(("a", "b")) == ((0L, 20L, 0L, 0L)))
  }

  test("estimate regime: 3-sigma band around truth, rho <= k") {
    // a: 600 shingles, b: 600 shingles, 200 shared → union 1000
    val shared = (0 until 202).map(i => s"s$i")
    val a = (0 until 402).map(i => s"a$i") ++ shared
    val b = shared ++ (0 until 402).map(i => s"b$i")
    val got = run(Seq(doc("a", a), doc("b", b)))
    val (nExact, estU, rho, estI) = got(("a", "b"))
    assert(nExact == 200L)
    assert(rho >= 0L && rho <= 64L)
    // k = 64 → ~12.5% relative error on the union; allow 3 sigma
    assert(estU > 600L && estU < 1400L, s"est_union=$estU")
    // intersection compounds union + Jaccard noise; generous band
    assert(estI >= 50L && estI <= 450L, s"est_inter=$estI")
  }

  test("pair orientation is source_a < source_b, every pair present") {
    val got = run(Seq(
      doc("b", (0 to 11).map(i => s"x$i")),
      doc("a", (0 to 11).map(i => s"x$i")),
      doc("c", (0 to 11).map(i => s"y$i"))))
    assert(got.keySet ==
      Set(("a", "b"), ("a", "c"), ("b", "c")))
    // a and b are identical: complete regime, full overlap
    assert(got(("a", "b")) == ((10L, 10L, 10L, 10L)))
  }
}
