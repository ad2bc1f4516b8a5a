package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The distributed 2-D skyline against the domination definition
  * itself: brute-force equivalence on duplicate-heavy data, the
  * tie/identical-point semantics, and the cross-partition prefix
  * handoff (the part the range factorization has to get right). */
class SkylineSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def sky(pts: Seq[(Long, Long, Long)],
      parts: Int): Set[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try RelationalQueries.skylineOf(
        pts.toDF("partkey", "cents", "size"))
      .as[(Long, Long, Long)].collect().toSet
    finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private def brute(
      pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, c, sz) =>
      !pts.exists { case (_, c2, sz2) =>
        c2 <= c && sz2 >= sz && (c2 < c || sz2 > sz)
      }
    }.toSet

  test("brute-force equivalence on duplicate-heavy data, several " +
      "partition counts") {
    // deterministic cloud with repeated coordinates but an
    // unsaturated grid (a fully-covered product grid degenerates to
    // a single-point frontier)
    val pts = (0L until 150L).map(i =>
      (i, (i * 37) % 101, (i * 53) % 103)) ++
      Seq((900L, 0L, 0L), (901L, 0L, 0L)) // duplicate extreme pair
    val truth = brute(pts)
    for (n <- Seq(1, 2, 7)) {
      assert(sky(pts, n) === truth, s"parts=$n")
    }
    assert(truth.size > 1, "degenerate fixture")
  }

  test("a downstream coalesce(1) — the Verify writer's shape — must " +
      "not fold the per-partition prefixes into slot 0") {
    val s = spark
    import s.implicits._
    val pts = (0L until 150L).map(i =>
      (i, (i * 37) % 101, (i * 53) % 103))
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "5")
    try {
      val viaOneTask = RelationalQueries.skylineOf(
          pts.toDF("partkey", "cents", "size"))
        .coalesce(1).as[(Long, Long, Long)].collect().toSet
      assert(viaOneTask === brute(pts))
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("identical points are mutually non-dominating: both kept") {
    val pts = Seq((1L, 10L, 5L), (2L, 10L, 5L), (3L, 20L, 4L))
    assert(sky(pts, 2) === Set((1L, 10L, 5L), (2L, 10L, 5L)))
  }

  test("same price: only the max size survives; same size: only " +
      "the cheapest") {
    assert(sky(Seq((1L, 10L, 5L), (2L, 10L, 7L)), 2) ===
      Set((2L, 10L, 7L)))
    assert(sky(Seq((1L, 10L, 5L), (2L, 8L, 5L)), 2) ===
      Set((2L, 8L, 5L)))
  }

  test("anti-chain: a strictly improving diagonal is all skyline") {
    val pts = (1L to 20L).map(i => (i, i, i)) // pricier AND bigger
    assert(sky(pts, 3) === pts.toSet)
  }

  test("chain: a strictly dominated staircase keeps one point") {
    val pts = (1L to 20L).map(i => (i, i, 100L - i)) // pricier AND smaller
    assert(sky(pts, 3) === Set((1L, 1L, 99L)))
  }

  test("incremental identity: skyline(frontier(B) ∪ A) == " +
      "skyline(B ∪ A), incl. a dominated-base resurrection probe") {
    val s = spark
    import s.implicits._
    val base = (0L until 150L).map(i =>
      (i, (i * 37) % 101, (i * 53) % 103)) ++
      // a base point strictly dominated INSIDE base: must not
      // resurface however the arriving batch lands around it
      Seq((500L, 50L, 1L), (501L, 49L, 2L))
    val arriving = Seq((600L, 3L, 90L), (601L, 200L, 1L),
      (602L, 50L, 1L)) // 602 ties the dominated base point exactly
    def skyOf(pts: Seq[(Long, Long, Long)]) =
      RelationalQueries.skylineOf(pts.toDF("partkey", "cents", "size"))
    val frontier = skyOf(base).as[(Long, Long, Long)].collect().toSeq
    val incr = skyOf(frontier ++ arriving)
      .as[(Long, Long, Long)].collect().toSet
    assert(incr === brute(base ++ arriving))
    assert(!incr.exists(_._1 == 500L))
  }
}
