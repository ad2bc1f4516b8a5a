package graft.rdf

import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import Vocab._

/** Property-style invariants for the rename/filter/union operators
  * (SURVEY §5 item 3) over generated triple sets. Sample counts stay
  * small because each case runs Spark jobs; the generators cover the
  * interesting structure (shared predicates, duplicates, mappings
  * that hit and miss).
  */
class RdfOpsPropertySpec extends AnyFunSuite {

  private val preds =
    Seq(DctermsTitle, DctermsRelation, OmekaIsPublic, CeoRijksmonumentnummer)

  private val genTriple: Gen[(String, String, String, String, String,
      String, String, String)] = for {
    s <- Gen.choose(1, 5).map(i => s"http://x/$i")
    p <- Gen.oneOf(preds)
    o <- Gen.choose(1, 6).map(i => s"v$i")
  } yield ("default", s, "iri", p, o, "literal", null, null)

  private def sample(seed: Long, size: Int) = {
    var sd = rng.Seed(seed)
    (1 to size).flatMap { _ =>
      val v = genTriple.apply(Gen.Parameters.default, sd)
      sd = sd.next
      v
    }
  }

  test("applyFilter: no filtered predicate survives; others untouched") {
    (1L to 5L).foreach { seed =>
      val rows = sample(seed, 20)
      val df = TestSpark.triples(rows)
      val fl = Seq(OmekaIsPublic, DctermsTitle)
      val out = RdfOps.applyFilter(df, fl).collect()
      assert(out.forall(r => !fl.contains(r.getString(3))))
      assert(out.length ==
        rows.count(r => !fl.contains(r._4)))
    }
  }

  test("applyMapping: cardinality preserved; no mapped source predicate remains") {
    val m = Map(DctermsTitle -> SdoName, OmekaIsPublic -> SdoIdentifier)
    (1L to 5L).foreach { seed =>
      val rows = sample(seed, 20)
      val df = TestSpark.triples(rows)
      val out = RdfOps.applyMapping(df, m).collect()
      assert(out.length == rows.length)
      assert(out.forall(r => !m.contains(r.getString(3))))
      // idempotence (mapping targets are not mapping sources)
      val twice = RdfOps.applyMapping(RdfOps.applyMapping(df, m), m)
      assert(twice.collect().map(_.toSeq).toSet ==
        out.map(_.toSeq).toSet)
    }
  }

  test("unionDedup: commutative, associative, idempotent (set laws)") {
    (1L to 3L).foreach { seed =>
      val a = TestSpark.triples(sample(seed, 10))
      val b = TestSpark.triples(sample(seed + 100, 10))
      val c = TestSpark.triples(sample(seed + 200, 10))
      def setOf(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSet
      val ab = setOf(RdfOps.unionDedup(a, b))
      assert(ab == setOf(RdfOps.unionDedup(b, a)))
      assert(setOf(RdfOps.unionDedup(RdfOps.unionDedup(a, b), c)) ==
        setOf(RdfOps.unionDedup(a, RdfOps.unionDedup(b, c))))
      assert(setOf(RdfOps.unionDedup(a, a)) == setOf(a.dropDuplicates()))
    }
  }
}
