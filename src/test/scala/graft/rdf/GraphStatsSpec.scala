package graft.rdf

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Multi-graph analytics + the TriG lifecycle: the multi-graph store
  * fixture must round-trip through the graph-aware TriG codec with
  * its graph column intact, and the overlap diff must see the
  * cross-graph duplicates the fixture plants. */
class GraphStatsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("multi-graph fixture round-trips through TriG with graphs intact") {
    val s = TestSpark.spark
    val mg = RdfQueries.multiGraph(s, dir)
    val out = Files.createTempDirectory("trig-mg").toFile.getAbsolutePath
    mg.write.format("turtle").option("syntax", "trig")
      .mode("overwrite").save(out)
    val back = s.read.format("turtle").load(out)
    val a = mg.distinct().collect().map(_.toSeq).toSet
    val b = back.distinct().collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
    // all four named graphs survive the codec
    assert(back.select("graph").distinct().count() == 4)
  }

  test("rdf_group_concat pins lexicographic member order and agrees " +
    "with the per-group count") {
    val s = TestSpark.spark
    val rows = RdfQueries.queries("rdf_group_concat")(s, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (brand, n, cat) =>
      val items = cat.split(";").toSeq
      // distinct members, count coherent, order PINNED lexicographic
      assert(items.distinct == items, brand)
      assert(items.length == n, brand)
      assert(items == items.sorted, brand)
    }
  }

  test("overlap diff finds statements asserted in more than one graph") {
    val s = TestSpark.spark
    val overlap = RdfQueries.queries("rdf_graph_overlap")(s, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    // the enrichment graph re-asserts item rdf:type triples that the
    // export carries in its own graphs (k % 6 == 0 ∧ k % 3 == 0 ∧
    // k % 4 <> 0 is non-empty), so the diff cannot be vacuous
    assert(overlap.nonEmpty)
    assert(overlap.forall(_._4 >= 2))
    assert(overlap.exists(_._2 == Vocab.RdfType))
  }
}
