package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SPARQL 1.1 UPDATE graph management on a hand-built quad store:
  * the designator grammar (GRAPH <iri> / DEFAULT / NAMED / ALL),
  * MOVE's source removal, target replacement vs accumulation
  * (COPY vs ADD), set dedup on collision, and the spec'd
  * same-graph no-op. */
class GraphMgmtSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def store() = {
    val s = spark
    import s.implicits._
    Seq(
      ("default", "s1", "iri", "p", "a", "literal", null, null),
      ("g1", "s2", "iri", "p", "b", "literal", null, null),
      ("g1", "s3", "iri", "p", "c", "literal", null, null),
      ("g2", "s2", "iri", "p", "b", "literal", null, null))
      .toDF(Model.columns: _*)
  }

  private def graphsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("CLEAR GRAPH / DEFAULT / NAMED / ALL") {
    assert(graphsOf(SparqlSelect.update(store(), "CLEAR GRAPH <g1>"))
      === Set(("default", "s1"), ("g2", "s2")))
    assert(graphsOf(SparqlSelect.update(store(), "CLEAR DEFAULT"))
      === Set(("g1", "s2"), ("g1", "s3"), ("g2", "s2")))
    assert(graphsOf(SparqlSelect.update(store(), "CLEAR NAMED"))
      === Set(("default", "s1")))
    assert(SparqlSelect.update(store(), "CLEAR ALL").count() === 0L)
  }

  test("COPY replaces the target; ADD accumulates; collisions dedup") {
    val copied = SparqlSelect.update(store(), "COPY GRAPH <g1> TO <g2>")
    assert(graphsOf(copied) === Set(("default", "s1"),
      ("g1", "s2"), ("g1", "s3"), ("g2", "s2"), ("g2", "s3")))
    // g2's (s2,b) collides with the copied g1 (s2,b): exactly one kept
    assert(copied.count() === 5L)
    val added = SparqlSelect.update(store(), "ADD GRAPH <g1> TO <g2>")
    assert(graphsOf(added) === graphsOf(copied))
    assert(added.count() === 5L)
  }

  test("MOVE removes the source; DEFAULT works as a designator") {
    val moved = SparqlSelect.update(store(), "MOVE GRAPH <g1> TO DEFAULT")
    assert(graphsOf(moved) ===
      Set(("default", "s2"), ("default", "s3"), ("g2", "s2")))
    // the old default graph was replaced, not merged
    assert(!graphsOf(moved).contains(("default", "s1")))
  }

  test("same-graph transfer is the spec'd no-op") {
    assert(graphsOf(SparqlSelect.update(store(),
      "MOVE GRAPH <g1> TO GRAPH <g1>")) === graphsOf(store()))
  }
}
