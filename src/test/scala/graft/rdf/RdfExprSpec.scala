package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Specs for the SPARQL 1.1 expression-layer queries: BIND + string
  * functions, term introspection, and the subquery/ORDER/LIMIT
  * solution-modifier form. Values are checked on the sf0.001 fixture
  * against independent driver-side recomputations; plan shapes are
  * asserted where the scale story IS the shape (no exchange for the
  * map-side query, bounded top-k for the modifier query).
  */
class RdfExprSpec extends AnyFunSuite {

  private val s = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("rdf_bind_strfuns: BINDs match driver-side string ops row by row") {
    val rows = RdfQueries.queries("rdf_bind_strfuns")(s, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val title = r.getAs[String]("title")
      assert(title.length >= 10)
      assert(r.getAs[String]("title_uc") == title.toUpperCase)
      assert(r.getAs[Long]("title_len") == title.length.toLong)
      assert(r.getAs[String]("slug") == title.replace(" ", "_"))
    }
  }

  test("rdf_bind_strfuns: langMatches keeps only nl-tagged literals") {
    val t = TripleFixture.triples(s, dir)
    val nlTitles = t.filter(org.apache.spark.sql.functions.col("predicate")
        === Vocab.DctermsTitle)
      .filter("obj_lang = 'nl' AND obj_kind = 'literal' " +
        "AND length(obj_value) >= 10").count()
    assert(RdfQueries.queries("rdf_bind_strfuns")(s, dir).count()
      == nlTitles)
  }

  test("rdf_bind_strfuns plans as one map-side pass — zero exchanges") {
    val plan = RdfQueries.queries("rdf_bind_strfuns")(s, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"expected an exchange-free plan, got:\n$plan")
  }

  test("rdf_term_stats: census sums to the store size; kinds partition it") {
    val out = RdfQueries.queries("rdf_term_stats")(s, dir).collect()
    val total = out.map(_.getAs[Long]("n_terms")).sum
    assert(total == TripleFixture.triples(s, dir).count())
    // the fixture carries all three introspection classes
    val kinds = out.map(_.getAs[String]("obj_kind")).toSet
    assert(kinds.contains("iri") && kinds.contains("literal"))
    assert(out.exists(r => r.getAs[String]("lang") == "nl"))
    assert(out.exists(r => r.getAs[String]("datatype") == Vocab.XsdInteger))
  }

  test("rdf_subquery_topn: exactly 5 rows, counts non-increasing, ties by subject") {
    val rows = RdfQueries.queries("rdf_subquery_topn")(s, dir).collect()
      .sortBy(r => (-r.getAs[Long]("n_triples"), r.getAs[String]("item")))
    assert(rows.length == 5)
    val counts = rows.map(_.getAs[Long]("n_triples"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    // independent recomputation of the same top-5
    val t = TripleFixture.triples(s, dir)
    val byCount = t.groupBy("subject").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (subj, n) => (-n, subj) }.take(5)
    assert(rows.map(r => (r.getAs[String]("item"),
      r.getAs[Long]("n_triples"))).toSeq == byCount.toSeq)
  }

  test("rdf_subquery_topn plans the bounded top-k (TakeOrderedAndProject)") {
    val plan = RdfQueries.queries("rdf_subquery_topn")(s, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected bounded top-k, got:\n$plan")
  }
}
