package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Degree-oriented triangle count ([[RelationalQueries
  * .triangleCountOf]]): the wedge join must count each triangle
  * exactly once on hand graphs with known censuses — including the
  * hub shape where a naive undirected wedge join double- or
  * sextuple-counts, and graphs with ties in the degree order. */
class TriangleSpec extends AnyFunSuite {

  private val s = TestSpark.spark
  import s.implicits._

  private def count(orders: Seq[(Long, Seq[Long])]): (Long, Long, Long) = {
    val li = orders.flatMap { case (ok, pks) => pks.map(ok -> _) }
      .toDF("ok", "pk")
    val r = RelationalQueries.triangleCountOf(li).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("a single co-order triple is one triangle; a pair adds none") {
    assert(count(Seq(1L -> Seq(1L, 2L, 3L), 2L -> Seq(3L, 4L))) ==
      (4L, 4L, 1L))
  }

  test("K4 has 4 triangles; edge dedup across orders doesn't " +
    "multi-count") {
    // two orders both containing {1,2,3}: edges dedup, still 1
    assert(count(Seq(1L -> Seq(1L, 2L, 3L), 2L -> Seq(1L, 2L, 3L)))
      ._3 == 1L)
    // K4 via one 4-item order: C(4,3) = 4 triangles
    assert(count(Seq(1L -> Seq(1L, 2L, 3L, 4L))) == (4L, 6L, 4L))
  }

  test("hub fan (star) has zero triangles despite many wedges") {
    // star center 9 with 5 leaves: 10 wedges at the hub, 0 closed —
    // the case the degree orientation keeps linear
    val star = (1L to 5L).map(i => i -> Seq(9L, i + 10L))
    assert(count(star)._3 == 0L)
  }

  test("two triangles sharing an edge; all-equal degrees (tie " +
    "order) count right") {
    // {1,2,3} and {2,3,4}: shared edge (2,3), 2 triangles
    assert(count(Seq(1L -> Seq(1L, 2L, 3L), 2L -> Seq(2L, 3L, 4L)))
      ._3 == 2L)
    // C5 cycle: all degrees 2 (pure id tie-break), 0 triangles
    val c5 = Seq(1L -> Seq(1L, 2L), 2L -> Seq(2L, 3L), 3L -> Seq(3L, 4L),
      4L -> Seq(4L, 5L), 5L -> Seq(5L, 1L))
    assert(count(c5) == (5L, 5L, 0L))
  }
}
