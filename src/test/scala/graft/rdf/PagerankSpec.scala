package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** rdf_pagerank: the 3-iteration fixed-point integer PageRank must
  * match an independent driver-side implementation node for node,
  * and conserve (bounded-loss) rank mass. */
class PagerankSpec extends AnyFunSuite {

  private val s = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val Scale = 1000000000L

  /** Plain-Scala replay of the identical integer recurrence. */
  private def reference(): Map[String, Long] = {
    val parts = s.read.parquet(s"$dir/part.parquet")
      .select("p_partkey").collect().map(_.getLong(0))
    val mx = parts.max
    val item = "http://ex.org/item/"
    val edges = parts.filter(k => k * 4 <= mx)
      .map(k => (s"$item$k", s"$item${k * 4}")) ++
      parts.filter(_ % 16 == 0)
        .map(k => (s"$item$k", s"$item${k / 16}"))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.length.toLong
    val odeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var pr = nodes.map(_ -> Scale / n).toMap
    (1 to 3).foreach { _ =>
      val contrib = edges.groupBy(_._2).view.mapValues(es =>
        es.map { case (u, _) => pr(u) / odeg(u) }.sum).toMap
      pr = nodes.map(v => v ->
        ((Scale / n) * 15 / 100 + 85 * contrib.getOrElse(v, 0L) / 100))
        .toMap
    }
    pr
  }

  test("engine ranks equal the driver-side integer recurrence, node for node") {
    val got = RdfQueries.queries("rdf_pagerank")(s, dir).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("pr_scaled"))
      .toMap
    val want = reference()
    assert(got.keySet == want.keySet && got.nonEmpty)
    got.foreach { case (node, v) => assert(v == want(node), node) }
  }

  test("rank mass is conserved up to damping leakage and integer floors") {
    val rows = RdfQueries.queries("rdf_pagerank")(s, dir).collect()
    val total = rows.map(_.getAs[Long]("pr_scaled")).sum
    val n = rows.length
    // each node holds at least the teleport floor; total cannot
    // exceed the initial mass (dangling + floor losses only shrink it)
    val teleport = (Scale / n) * 15 / 100 * n
    assert(total >= teleport)
    assert(total <= Scale)
  }
}
