package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Connected-component rollup ([[RelationalQueries.componentsOf]]):
  * hand graphs with known component censuses, including a chain long
  * enough that plain one-hop propagation would need more rounds than
  * pointer jumping takes (the convergence loop must not stop
  * early). */
class ComponentsSpec extends AnyFunSuite {

  private val s = TestSpark.spark
  import s.implicits._

  /** Orders as (orderkey, first-line part, second-line part). */
  private def rollup(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val li = edges.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i.toLong, a, 1), (i.toLong, b, 2))
    }.toDF("ok", "pk", "ln")
    RelationalQueries.componentsOf(li).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two components and an ignored high-to-low pair") {
    // {1,2,3} via 1-2, 2-3; {5,6}; (9,4) has pk DESC across the
    // line order so the directed-increasing rule drops it — 9 and 4
    // never become nodes
    assert(rollup(Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 4L))) ==
      Map(1L -> 3L, 5L -> 2L))
  }

  test("a 40-node chain converges to one component") {
    val chain = (1L until 40L).map(i => (i, i + 1))
    assert(rollup(chain) == Map(1L -> 40L))
  }

  test("duplicate co-purchases don't inflate sizes") {
    assert(rollup(Seq((1L, 2L), (1L, 2L), (1L, 2L))) == Map(1L -> 2L))
  }
}
