package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Synchronous LPA against an in-memory reference implementation of
  * the same fixed-round schedule — plurality argmax, smallest-label
  * ties, no self-label — on hand-built graphs where the dynamics
  * (including the star's tie oscillation) are known. */
class CommunitiesSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  /** Membership rows: one synthetic order per edge. */
  private def run(edges: Seq[(Long, Long)],
      rounds: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val li = edges.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i.toLong, a), (i.toLong, b))
    }
    RelationalQueries.communitiesOf(li.toDF("ok", "pk"), rounds)
      .as[(Long, Long)].collect().toMap
  }

  /** The definition, straight-line. */
  private def reference(edges: Seq[(Long, Long)],
      rounds: Int): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map[Long, List[Long]]()
      .withDefaultValue(Nil)
    edges.distinct.foreach { case (a, b) =>
      adj(a) = b :: adj(a); adj(b) = a :: adj(b)
    }
    var lab = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = adj.keys.map { n =>
        val counts = adj(n).groupBy(lab).map { case (l, xs) =>
          (l, xs.size)
        }
        val best = counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        n -> best
      }.toMap
    }
    lab.groupBy(_._2).map { case (l, m) => (l, m.size.toLong) }
  }

  test("brute-force equivalence: two cliques with a bridge") {
    val k5a = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val k5b = for (a <- 11L to 15L; b <- (a + 1) to 15L) yield (a, b)
    val g = k5a ++ k5b ++ Seq((5L, 11L))
    assert(run(g, 4) === reference(g, 4))
    // and the expected community structure: the two cliques
    assert(run(g, 4).values.toSeq.sorted === Seq(5L, 5L))
  }

  test("disconnected triangles settle on their min labels") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (7L, 8L), (8L, 9L), (7L, 9L))
    val out = run(g, 4)
    assert(out === Map(1L -> 3L, 7L -> 3L))
  }

  test("star tie-break: the center adopts the smallest leaf label " +
      "(synchronous oscillation is replayed, not hidden)") {
    val g = Seq((10L, 1L), (10L, 2L), (10L, 3L))
    for (r <- 1 to 3) {
      assert(run(g, r) === reference(g, r), s"rounds=$r")
    }
  }

  test("path graph, several round counts") {
    val g = (1L to 8L).sliding(2).map(p => (p(0), p(1))).toSeq
    for (r <- Seq(1, 2, 4)) {
      assert(run(g, r) === reference(g, r), s"rounds=$r")
    }
  }
}
