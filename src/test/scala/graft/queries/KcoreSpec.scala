package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** K-core peel vs known censuses. Graphs are encoded in the
  * co-purchase projection's input shape: one (ok, pk) order per
  * edge, two rows each. */
class KcoreSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  private def li(edges: Seq[(Long, Long)]) =
    edges.zipWithIndex.flatMap { case ((u, v), i) =>
      Seq((i.toLong, u), (i.toLong, v))
    }.toDF("ok", "pk")

  private def core(edges: Seq[(Long, Long)], k: Int, rounds: Int = 16) =
    RelationalQueries.kcoreOf(li(edges), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K5 clique survives the 4-core; a pendant path cascades off") {
    val clique = for {
      a <- 1L to 5L; b <- (a + 1) to 5L
    } yield (a, b)
    // pendant path 5–6–7: node 6 has degree 2, node 7 degree 1 —
    // 7 peels first, then 6 (the cascade), clique unaffected
    val g = clique ++ Seq((5L, 6L), (6L, 7L))
    val got = core(g, 4)
    assert(got == (1L to 5L).map(_ -> 4L).toMap)
  }

  test("a cycle IS its own 2-core; a path fully peels (deep cascade)") {
    val cycle = (1L to 6L).map(i => (i, if (i == 6) 1L else i + 1))
    assert(core(cycle, 2) == (1L to 6L).map(_ -> 2L).toMap)
    val path = (1L to 9L).map(i => (i, i + 1))
    assert(core(path, 2).isEmpty)
  }

  test("exceeding the oracle's unroll bound fails loudly") {
    // a 12-node path at k=2 peels one node from each end per round —
    // ~5 rounds; a bound of 2 must trip the lockstep guard
    val path = (1L to 12L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException](core(path, 2, rounds = 2))
    assert(e.getMessage.contains("unroll bound"))
  }

  test("core degrees are the degrees WITHIN the core, not the input") {
    // two triangles sharing a vertex: every node 2-core-survives;
    // the shared vertex has core degree 4, the rest 2
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (3L, 5L))
    val got = core(g, 2)
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 4L, 4L -> 2L, 5L -> 2L))
  }
}
