package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The incremental-triangle enumeration ([[RelationalQueries
  * .trianglesMerge]]): hand graphs where new triangles carry one,
  * two, or all three new edges — the sorted-triple dedup must count
  * each exactly once — plus redelivered (already-known) edges adding
  * nothing. */
class TrianglesIncrSpec extends AnyFunSuite {

  private val s = TestSpark.spark
  import s.implicits._

  private def run(nBase: Long, base: Seq[(Long, Long)],
      delta: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    val r = RelationalQueries.trianglesMerge(
      Seq(nBase).toDF("n_base"),
      base.toDF("a", "b"), delta.toDF("a", "b")).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("one new edge closing a wedge: one triangle") {
    assert(run(0L, Seq((1L, 2L), (2L, 3L)), Seq((1L, 3L))) ==
      ((0L, 1L, 1L, 1L)))
  }

  test("a triangle with TWO new edges counts once; with THREE new " +
    "edges counts once") {
    // base has 1-2; delta brings 2-3 and 1-3 → triangle {1,2,3}
    assert(run(5L, Seq((1L, 2L)), Seq((2L, 3L), (1L, 3L))) ==
      ((5L, 1L, 2L, 6L)))
    // all three edges new
    assert(run(0L, Nil, Seq((7L, 8L), (8L, 9L), (7L, 9L))) ==
      ((0L, 1L, 3L, 1L)))
  }

  test("redelivered known edges are not delta; disconnected new " +
    "edges close nothing") {
    assert(run(3L, Seq((1L, 2L), (2L, 3L), (1L, 3L)),
      Seq((1L, 2L), (50L, 60L))) == ((3L, 0L, 1L, 3L)))
  }

  test("one new edge closing several wedges counts each triangle") {
    // 1-2 arrives; common neighbors 3, 4, 5 via base wedges
    val base = Seq((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L),
      (1L, 5L), (2L, 5L))
    assert(run(0L, base, Seq((1L, 2L))) == ((0L, 3L, 1L, 3L)))
  }
}
