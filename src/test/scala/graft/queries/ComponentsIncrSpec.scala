package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The incremental-CC contraction ([[RelationalQueries
  * .componentsMerge]]): stored labels + delta edges must reproduce a
  * full recompute over base ∪ delta on hand graphs covering every
  * merge shape — two-component merge, brand-new nodes (attached and
  * free-standing), internal edges (touched but unchanged), and
  * untouched pass-through. */
class ComponentsIncrSpec extends AnyFunSuite {

  private val s = TestSpark.spark
  import s.implicits._

  /** base labels from explicit (node, rep) rows. */
  private def labels(rows: Seq[(Long, Long)]) =
    rows.toDF("doc_id", "cluster_id")

  private def pairs(rows: Seq[(Long, Long)]) =
    rows.toDF("doc_a", "doc_b")

  private def merge(base: Seq[(Long, Long)],
      delta: Seq[(Long, Long)]): Map[Long, (Long, Boolean)] =
    RelationalQueries.componentsMerge(labels(base), pairs(delta))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap

  // base: {1,2,3} rep 1; {5,6} rep 5; {8} rep 8
  private val base = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L,
    5L -> 5L, 6L -> 5L, 8L -> 8L)

  test("delta edge merges two components; third passes untouched") {
    assert(merge(base, Seq((3L, 5L))) ==
      Map(1L -> ((5L, true)), 8L -> ((1L, false))))
  }

  test("new node attaches; free-standing new pair forms its own " +
    "component") {
    assert(merge(base, Seq((6L, 9L), (20L, 21L))) ==
      Map(1L -> ((3L, false)), 5L -> ((3L, true)),
        8L -> ((1L, false)), 20L -> ((2L, true))))
  }

  test("internal delta edge: component touched, size unchanged") {
    assert(merge(base, Seq((1L, 2L))) ==
      Map(1L -> ((3L, true)), 5L -> ((2L, false)),
        8L -> ((1L, false))))
  }

  test("chain of merges through a new node collapses all three") {
    // 3-9 and 9-5 link comp 1 and comp 5 through new node 9;
    // 8 joins via 6-8... all six base nodes + node 9 in one comp
    assert(merge(base, Seq((3L, 9L), (5L, 9L), (6L, 8L))) ==
      Map(1L -> ((7L, true))))
  }
}
