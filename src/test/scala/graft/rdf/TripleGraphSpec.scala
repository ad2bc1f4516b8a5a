package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import Vocab._

/** The rdflib-Graph-equivalent surface (SURVEY §1.3 mapping). */
class TripleGraphSpec extends AnyFunSuite {

  private val n: String = null

  private def g = TripleGraph(TestSpark.triples(Seq(
    ("default", "http://x/1", "iri", DctermsTitle, "t1", "literal", "nl", n),
    ("default", "http://x/1", "iri", RdfType, CeoRijksmonument, "iri", n, n),
    ("default", "http://x/2", "iri", DctermsTitle, "t2", "literal", n, n))))

  test("triples() pattern filter binds any subset of positions") {
    assert(g.triples().count() == 3)
    assert(g.triples(p = Some(DctermsTitle)).count() == 2)
    assert(g.triples(s = Some("http://x/1"), p = Some(DctermsTitle))
      .count() == 1)
    assert(g.triples(o = Some("t2")).count() == 1)
  }

  test("contains / size mirror rdflib membership and len") {
    assert(g.contains("http://x/1", RdfType, CeoRijksmonument))
    assert(!g.contains("http://x/2", RdfType, CeoRijksmonument))
    assert(g.size == 3)
  }

  test("add has set semantics; remove is a pattern anti-filter") {
    val dup = TestSpark.triples(Seq(
      ("default", "http://x/1", "iri", DctermsTitle, "t1", "literal", "nl", n)))
    assert(g.add(dup).size == 3) // re-adding an existing triple: no-op
    val removed = g.remove(p = Some(DctermsTitle))
    assert(removed.size == 1)
    assert(!removed.contains("http://x/1", DctermsTitle, "t1"))
  }

  test("typed Dataset view and Turtle round-trip") {
    val typed = g.ds.collect()
    assert(typed.length == 3 &&
      typed.forall(_.graph == "default"))
    val spark = TestSpark.spark
    import spark.implicits._
    val doc = g.toTurtle().collect().mkString("\n")
    val back = TripleGraph.fromTurtle(spark.createDataset(Seq(doc)))
    assert(back.df.collect().toSet == g.df.collect().toSet)
  }
}
