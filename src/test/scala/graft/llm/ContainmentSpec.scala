package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Asymmetric containment over the LSH candidate pairs: values are
  * re-derived in plain Scala per pair (independent tokenize → bigram
  * set → intersection), and the metric's algebraic relations to
  * Jaccard are asserted corpus-wide. */
class ContainmentSpec extends AnyFunSuite {

  private val s = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def bigrams(text: String): Set[String] = {
    val w = text.trim.toLowerCase.split("\\s+").toSeq
    w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }.toSet
  }

  test("containment matches a plain-Scala recomputation on every pair") {
    val texts = s.read.parquet(s"$dir/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val rows = LlmQueries.queries("llm_containment")(s, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val (ba, bb) = (bigrams(texts(a)), bigrams(texts(b)))
      val inter = (ba intersect bb).size.toLong
      assert(r.getAs[Long]("cont_a_x1000") == 1000L * inter / ba.size)
      assert(r.getAs[Long]("cont_b_x1000") == 1000L * inter / bb.size)
      assert(r.getAs[Long]("cont_min_side_x1000") ==
        1000L * inter / math.min(ba.size, bb.size))
    }
  }

  test("containment dominates Jaccard and min-side containment is the max") {
    val cont = LlmQueries.queries("llm_containment")(s, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("cont_a_x1000"), r.getAs[Long]("cont_b_x1000"),
          r.getAs[Long]("cont_min_side_x1000"))).toMap
    val jac = LlmQueries.queries("llm_ngram_jaccard")(s, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("jaccard_x1000")).toMap
    // same candidate pairs, and on each: J <= min(cA,cB);
    // cont_min_side = max(cA,cB) (floor is monotone)
    assert(cont.keySet == jac.keySet && cont.nonEmpty)
    cont.foreach { case (k, (ca, cb, cm)) =>
      assert(jac(k) <= math.min(ca, cb))
      assert(cm == math.max(ca, cb))
      assert(ca >= 0 && ca <= 1000 && cb >= 0 && cb <= 1000)
    }
  }
}
