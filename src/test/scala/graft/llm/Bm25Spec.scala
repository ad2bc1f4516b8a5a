package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Integer-exact BM25 ranked retrieval ([[LlmQueries.bm25TopKOf]]):
  * the scaled-rational scoring must reproduce a directly computed
  * BigInt reference on a hand corpus, honor the BM25 orderings
  * (more matched terms beat fewer; shorter docs beat longer at equal
  * tf; rarer terms outweigh common ones), and keep the documented
  * tie order (score desc, doc_id asc). */
class Bm25Spec extends AnyFunSuite {

  private val s = TestSpark.spark
  import s.implicits._

  private def postingsOf(docs: Seq[(Long, String)]) =
    docs.flatMap { case (id, text) =>
      text.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (t, g) => (id, t, g.length.toLong) }
    }.toDF("doc_id", "term", "tf")

  /** Direct BigInt replay of the documented formula. */
  private def refScore(docs: Seq[(Long, String)],
      terms: Seq[String]): Map[Long, Long] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val n = BigInt(docs.size)
    val sLen = BigInt(toks.values.map(_.size).sum)
    docs.map { case (id, _) =>
      val dl = BigInt(toks(id).size)
      val score = terms.map { t =>
        val tf = BigInt(toks(id).count(_ == t))
        if (tf == 0) BigInt(0)
        else {
          val df = BigInt(toks.values.count(_.contains(t)))
          (BigInt(1000000) * (2 * (n - df) + 1) * (44 * sLen * tf)) /
            ((2 * df + 1) * (20 * sLen * tf + 6 * sLen + 18 * dl * n))
        }
      }.sum
      id -> score.toLong
    }.toMap
  }

  private val corpus = Seq(
    1L -> "hash join hash join scan",
    2L -> "hash scan filter window window agg sort merge batch",
    3L -> "join join join hash",
    4L -> "filter scan",
    5L -> "window window window window window window window window")

  private def run(qs: Seq[(Int, Seq[String])], k: Int = 10) =
    LlmQueries.bm25TopKOf(s, postingsOf(corpus), qs, k)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3)))

  test("scores match a direct BigInt replay of the formula") {
    val terms = Seq("hash", "join")
    val got = run(Seq(1 -> terms)).map(r => r._2 -> r._4).toMap
    val ref = refScore(corpus, terms).filter(_._2 > 0)
    assert(got == ref)
  }

  test("ranking honors BM25 orderings") {
    val got = run(Seq(1 -> Seq("hash", "join")))
    val order = got.sortBy(_._3).map(_._2)
    // docs 1 and 3 match both terms with high tf and short dl; doc 2
    // matches one term once in a long doc and must rank below both
    assert(order.take(2).toSet == Set(1L, 3L))
    assert(order.indexOf(2L) == 2)
    // rarer term outweighs a common one at equal tf and dl: "filter"
    // (df 2) beats "scan" (df 3) from identical positions in doc 4
    val fr = run(Seq(1 -> Seq("filter"))).map(r => r._2 -> r._4).toMap
    val sc = run(Seq(1 -> Seq("scan"))).map(r => r._2 -> r._4).toMap
    assert(fr(4L) > sc(4L))
  }

  test("absent terms score zero rows; k caps output; ties by doc_id") {
    assert(run(Seq(7 -> Seq("nosuchterm"))).isEmpty)
    val capped = run(Seq(1 -> Seq("hash")), k = 2)
    assert(capped.length == 2 && capped.map(_._3).toSeq == Seq(1, 2))
    // identical docs tie exactly → doc_id ascending
    val twin = Seq(10L -> "alpha beta", 11L -> "alpha beta",
      12L -> "gamma")
    val t = LlmQueries.bm25TopKOf(s, postingsOf(twin),
      Seq(1 -> Seq("alpha")), 10)
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(t.sortBy(_._2).map(_._1).toSeq == Seq(10L, 11L))
  }
}
