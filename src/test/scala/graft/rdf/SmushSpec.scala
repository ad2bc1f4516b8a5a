package graft.rdf

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Entity-smushing semantics: after the rewrite no mapped monument
  * resource survives in either term position, merged entities
  * collapse their duplicate assertions (set semantics absorb the
  * enrichment's type row onto the already-typed item), and rows
  * outside the mapping pass through untouched. */
class SmushSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("smush leaves no mapped monument IRI in subject or IRI-object " +
      "position, collapses merged duplicates, and passes the rest") {
    val smushed = RdfQueries.queries("rdf_smush_entities")(s, d)
    val t = TripleFixture.triples(s, d)
    val enr = TripleFixture.enrichment(s, d)
    val union = t.unionByName(enr).dropDuplicates()
    val mapped = t.filter(col("predicate") === Vocab.CeoRijksmonumentnummer)
      .select(concat(lit(TripleFixture.MonNs),
        when(col("obj_value").startsWith("RM"),
          expr("substring(obj_value, 3)"))
          .otherwise(col("obj_value"))).as("mon"))
      .distinct()
    // every monument the enrichment asserted AND the mapping names
    // is gone from the smushed graph's subjects
    val survivors = smushed.join(
      mapped.withColumnRenamed("mon", "subject"), Seq("subject"),
      "left_semi")
    assert(survivors.count() === 0)
    val objSurvivors = smushed.filter(col("obj_kind") === "iri").join(
      mapped.withColumnRenamed("mon", "obj_value"), Seq("obj_value"),
      "left_semi")
    assert(objSurvivors.count() === 0)
    // merging collapsed duplicate assertions: strictly fewer rows
    // than the raw union (mon's type row lands on the typed item)
    assert(smushed.count() < union.count())
    // rows with no term in the mapping are untouched
    val untouched = union
      .join(mapped.withColumnRenamed("mon", "subject"), Seq("subject"),
        "left_anti")
      .join(mapped.withColumnRenamed("mon", "obj_value"),
        Seq("obj_value"), "left_anti")
    assert(untouched.join(smushed,
      Seq("graph", "subject", "subject_kind", "predicate", "obj_value",
        "obj_kind"), "left_anti").count() === 0)
  }
}
