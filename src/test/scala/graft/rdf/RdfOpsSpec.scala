package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import Vocab._

/** Unit tests for the reference operators (SURVEY.md §2), including
  * the intent-vs-observed deltas of bugs B1/B2 (SURVEY §2.4).
  */
class RdfOpsSpec extends AnyFunSuite {

  private val n: String = null

  private def row(s: String, p: String, o: String, kind: String = "iri")
      : (String, String, String, String, String, String, String, String) =
    ("default", s, "iri", p, o, kind, n, n)

  test("O4: @context filter removes subject- and object-side leaks") {
    val df = TestSpark.triples(Seq(
      row("http://x/1", DctermsTitle, "ok", "literal"),
      row("@context", DctermsTitle, "leak", "literal"),
      row("http://x/2", DctermsRelation, "http://x/@context/3")))
    val out = RdfOps.filterContextLeaks(df).select("subject")
      .collect().map(_.getString(0)).toSet
    assert(out == Set("http://x/1"))
  }

  test("O5/O7: IRI validity filters subjects always, objects only for iri kind") {
    val df = TestSpark.triples(Seq(
      row("http://x/1", DctermsTitle, "not a uri but literal", "literal"),
      row("not a uri", DctermsTitle, "x", "literal"),
      row("http://x/2", DctermsRelation, "http://bad uri/"),
      row("http://x/3", DctermsRelation, "http://good/uri")))
    val out = RdfOps.filterValidObjectIris(RdfOps.filterValidSubjects(df))
      .select("subject").collect().map(_.getString(0)).toSet
    assert(out == Set("http://x/1", "http://x/3"))
  }

  test("O6 (B1 intent): customvocab anti-join removes references to cv-typed items") {
    // The reference's filter is dead code (export_from_omeka_s.py:60
    // always evaluates False — bug B1); the engine implements the
    // logged *intent*: drop triples whose object is a subject typed
    // with a customvocab class.
    val df = TestSpark.triples(Seq(
      row("http://x/1", OmekaResourceClass, "http://v/cv#7"),
      row("http://v/cv#7", RdfType, "http://omeka.org/s/vocabs/o#customvocab"),
      row("http://x/2", DctermsRelation, "http://x/1")))
    val out = RdfOps.filterCustomvocabRefs(df)
      .select("subject").collect().map(_.getString(0)).toSet
    // the reference to cv#7 is gone; the cv type row itself and the
    // unrelated relation survive
    assert(out == Set("http://v/cv#7", "http://x/2"))
  }

  test("O17: applyMapping rewrites predicates and preserves cardinality; idempotent") {
    val df = TestSpark.triples(Seq(
      row("http://x/1", DctermsTitle, "t", "literal"),
      row("http://x/2", DctermsRelation, "http://x/3")))
    val m = Map(DctermsTitle -> SdoName)
    val once = RdfOps.applyMapping(df, m)
    assert(once.count() == df.count())
    val preds = once.select("predicate").collect().map(_.getString(0)).toSet
    assert(preds == Set(SdoName, DctermsRelation))
    val twice = RdfOps.applyMapping(once, m)
    assert(twice.collect().toSet == once.collect().toSet)
  }

  test("O18: applyFilter leaves no filtered predicate") {
    val df = TestSpark.triples(Seq(
      row("http://x/1", OmekaIsPublic, "true", "literal"),
      row("http://x/1", DctermsTitle, "t", "literal")))
    val out = RdfOps.applyFilter(df, Seq(OmekaIsPublic, OmekaResourceClass))
    val preds = out.select("predicate").collect().map(_.getString(0)).toSet
    assert(preds == Set(DctermsTitle))
    assert(RdfOps.applyFilter(df, Nil).count() == 2)
  }

  test("O15: unionDedup has set semantics (idempotent, commutative)") {
    val a = TestSpark.triples(Seq(
      row("http://x/1", DctermsTitle, "t", "literal"),
      row("http://x/2", DctermsRelation, "http://x/3")))
    val b = TestSpark.triples(Seq(
      row("http://x/1", DctermsTitle, "t", "literal"), // duplicate of a
      row("http://x/4", DctermsTitle, "u", "literal")))
    assert(RdfOps.unionDedup(a, a).count() == 2) // adding a set to itself
    val ab = RdfOps.unionDedup(a, b).collect().toSet
    val ba = RdfOps.unionDedup(b, a).collect().toSet
    assert(ab == ba && ab.size == 3)
  }

  test("O14 (B2 intent): enrichmentKeys normalizes RM prefix, dedups, literal-only") {
    // B2: the reference's isinstance(str(obj), URIRef) guard is always
    // true, so it fetches for IRI objects too; the engine implements
    // the intent (literals only) — the iri-kind row below is excluded.
    val df = TestSpark.triples(Seq(
      row("http://x/1", CeoRijksmonumentnummer, "RM12345", "literal"),
      row("http://x/2", CeoRijksmonumentnummer, "12345", "literal"),
      row("http://x/3", CeoRijksmonumentnummer, "67", "literal"),
      row("http://x/4", CeoRijksmonumentnummer, "http://mon/9", "iri"),
      row("http://x/5", DctermsTitle, "RM999", "literal")))
    val keys = RdfOps.enrichmentKeys(df)
      .collect().map(_.getString(0)).toSet
    assert(keys == Set("12345", "67"))
  }

  test("O16: enrich unions fetched triples and derives sameAs for typed subjects") {
    val g = TestSpark.triples(Seq(
      row("http://x/1", CeoRijksmonumentnummer, "RM1", "literal"),
      row("http://x/2", CeoRijksmonumentnummer, "2", "literal"),
      row("http://x/1", RdfType, CeoRijksmonument)))
    // the fetch types x/2 (but not x/3) as Rijksmonument
    val fetched = TestSpark.triples(Seq(
      row("http://x/2", RdfType, CeoRijksmonument),
      row("http://mon/2", DctermsIdentifier, "2", "literal")))
    val out = RdfOps.enrich(g, fetched)
    val sameAs = out.filter(s"predicate = '$SdoSameAs'")
      .select("subject", "obj_value").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // x/1 typed in g, x/2 typed via the fetch → both get sameAs
    assert(sameAs == Set(("http://x/1", "RM1"), ("http://x/2", "2")))
    assert(out.count() == 3 + 2 + 2)
  }
}
