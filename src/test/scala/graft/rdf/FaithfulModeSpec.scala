package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import Vocab._

/** Differential tests: the reference's OBSERVED (buggy) behavior vs
  * its intent, reproducible under `faithful = true` (SURVEY §7
  * hard-point 3; bugs B1/B2, SURVEY §2.4).
  *
  *  - B1 (export_from_omeka_s.py:60): `"customvocab" in
  *    str(graph[obj: RDF.type])` stringifies a *generator object*, so
  *    the O6 filter never fires — observed behavior keeps every
  *    customvocab-referencing triple the intent would remove.
  *  - B2 (transform_datamodel.py:92): `not isinstance(str(obj),
  *    URIRef)` is always true (str() returns str), so the reference
  *    fetches enrichment for IRI-valued rijksmonumentnummer objects
  *    too — observed keys are a strict superset of the intent's
  *    literal-only keys.
  */
class FaithfulModeSpec extends AnyFunSuite {

  private val n: String = null

  private def fixture = TestSpark.triples(Seq(
    // a customvocab term + a triple referencing it (O6's target)
    ("default", "http://ex/cv1", "iri", RdfType,
      "http://omeka.org/s/vocabs/o#customvocab", "iri", n, n),
    ("default", "http://ex/item1", "iri", "http://ex/p",
      "http://ex/cv1", "iri", n, n),
    // an unrelated clean triple
    ("default", "http://ex/item2", "iri", DctermsTitle,
      "Fresco", "literal", "nl", n),
    // rijksmonumentnummer: one literal, one IRI-valued object
    ("default", "http://ex/item2", "iri", CeoRijksmonumentnummer,
      "RM12", "literal", n, n),
    ("default", "http://ex/item3", "iri", CeoRijksmonumentnummer,
      "https://monument.example/45", "iri", n, n)))

  test("B1: observed cleanExport keeps what the intent removes — " +
    "the delta is exactly the customvocab-referencing rows") {
    val intent = RdfOps.cleanExport(fixture).collect().toSet
    val observed = RdfOps.cleanExport(fixture, faithful = true)
      .collect().toSet
    assert(intent.subsetOf(observed))
    val delta = observed -- intent
    assert(delta.map(r => (r.getString(1), r.getString(4))) ==
      Set(("http://ex/item1", "http://ex/cv1")))
  }

  test("B2: observed enrichmentKeys fetches for IRI objects too — " +
    "a strict superset of the literal-only intent") {
    val intent = RdfOps.enrichmentKeys(fixture)
      .collect().map(_.getString(0)).toSet
    val observed = RdfOps.enrichmentKeys(fixture, faithful = true)
      .collect().map(_.getString(0)).toSet
    assert(intent == Set("12"))
    assert(observed == Set("12", "https://monument.example/45"))
  }
}
