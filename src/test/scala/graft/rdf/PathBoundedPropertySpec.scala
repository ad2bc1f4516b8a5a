package graft.rdf

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized property for the bounded-repetition ladder: on any
  * small random digraph (cycles and diamonds included),
  * [[RdfOps.pathBounded]] must equal a plain-Scala
  * exists-a-path-of-length-k reference computed by boolean matrix
  * composition — the semantics min-hop reach gets wrong. */
class PathBoundedPropertySpec extends AnyFunSuite {

  private val s = TestSpark.spark
  import s.implicits._

  /** Reference: pairs with SOME path of length in [lo, hi]. */
  private def ref(n: Int, edges: Set[(Int, Int)], lo: Int,
      hi: Int): Set[(Int, Int)] = {
    var rk = edges // paths of length exactly k (pairs, deduped)
    var acc = Set.empty[(Int, Int)]
    (1 to hi).foreach { k =>
      if (k > 1)
        rk = for ((a, m) <- rk; (m2, b) <- edges if m == m2)
          yield (a, b)
      if (k >= lo) acc ++= rk
    }
    acc
  }

  test("ladder == matrix-composition reference on 60 random " +
    "digraphs with cycles") {
    val rnd = new Random(11)
    (1 to 60).foreach { trial =>
      val n = 3 + rnd.nextInt(6)
      val edges = (1 to (n + rnd.nextInt(2 * n)))
        .map(_ => (rnd.nextInt(n), rnd.nextInt(n)))
        .filter { case (a, b) => a != b }.toSet
      if (edges.nonEmpty) {
        val lo = 1 + rnd.nextInt(3)
        val hi = lo + rnd.nextInt(3)
        val df = edges.toSeq.map { case (a, b) =>
          (s"n$a", s"n$b") }.toDF("src", "dst")
        val got = RdfOps.pathBounded(df, lo, hi).collect()
          .map(r => (r.getString(0).drop(1).toInt,
            r.getString(1).drop(1).toInt)).toSet
        val want = ref(n, edges, lo, hi)
        assert(got == want,
          s"trial $trial: n=$n edges=$edges {$lo,$hi}")
      }
    }
  }
}
