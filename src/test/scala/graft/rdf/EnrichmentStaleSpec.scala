package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import Vocab._

/** The freshness contract of incremental enrichment (O14): the
  * reference re-fetches EVERY key weekly (transform_datamodel.py:
  * 88–101), so an upstream monument-record edit propagates within a
  * week. The TTL fetch list ([[RdfOps.enrichmentFetchList]]) must
  * restore that under incrementality: a stored-but-stale key is
  * re-fetched, and [[Enrichment.applyRefresh]] REPLACES its old rows
  * (set-union alone would keep the stale triple forever). */
class EnrichmentStaleSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val Mon = "https://monumenten.example.org/monument/"

  private def trip(subj: String, pred: String, v: String,
      kind: String): (String, String, String, String, String, String,
      String, String) =
    ("default", subj, "iri", pred, v, kind, null, null)

  private val tripleCols = Seq("graph", "subject", "subject_kind",
    "predicate", "obj_value", "obj_kind", "obj_lang", "obj_datatype")

  test("fetch list = missing keys + keys past the TTL, tagged") {
    val s = spark
    import s.implicits._
    val exportKeys = Seq("100", "200", "300").toDF("monument_key")
    // 100 fetched 10 days ago (stale at ttl=7); 200 fresh; 300 never
    val ledger = Seq(("100", 10), ("200", 2))
      .toDF("monument_key", "age_days")
    val got = RdfOps.enrichmentFetchList(exportKeys, ledger, ttlDays = 7)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("300", "missing"), ("100", "stale")))
    // ttl boundary is >=: a key fetched exactly ttl days ago is stale
    val edge = RdfOps.enrichmentFetchList(exportKeys,
      Seq(("100", 7), ("200", 6)).toDF("monument_key", "age_days"), 7)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(edge == Set(("300", "missing"), ("100", "stale")))
  }

  test("an updated upstream record propagates: re-fetch of the stale " +
    "key replaces its old triples in the snapshot, fresh keys keep " +
    "theirs") {
    val s = spark
    import s.implicits._
    val exportKeys = Seq("100", "200").toDF("monument_key")
    val ledger = Seq(("100", 10), ("200", 2))
      .toDF("monument_key", "age_days")
    // stored snapshot: both monuments present, 100 with the OLD name
    val snapshot = Seq(
      trip(Mon + "100", DctermsTitle, "Old Mill", "literal"),
      trip(Mon + "100", RdfType, CeoRijksmonument, "iri"),
      trip(Mon + "200", DctermsTitle, "Town Hall", "literal"))
      .toDF(tripleCols: _*)
    // upstream has renamed monument 100 since the last fetch
    val upstream: Map[String, Seq[Turtle.FlatTriple]] = Map(
      "100" -> Seq(
        trip(Mon + "100", DctermsTitle, "New Mill", "literal"),
        trip(Mon + "100", RdfType, CeoRijksmonument, "iri")),
      "200" -> Seq(
        trip(Mon + "200", DctermsTitle, "SHOULD NOT BE FETCHED",
          "literal")))
    val fetchList = RdfOps.enrichmentFetchList(exportKeys, ledger, 7)
    val fetched = Enrichment.fetchAll(
      fetchList.select("monument_key"), upstream(_))
    val refreshed = Enrichment.applyRefresh(snapshot, fetched)
    val titles = refreshed.filter(col("predicate") === DctermsTitle)
      .select("subject", "obj_value")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // the edit propagated; the stale title is GONE; the fresh key was
    // neither re-fetched nor disturbed
    assert(titles == Set((Mon + "100", "New Mill"),
      (Mon + "200", "Town Hall")))
    assert(refreshed.filter(col("obj_value") === "Old Mill").count() == 0)
  }

  test("rdf_enrich_stale over the fixture: missing = never-fetched " +
    "keys (k%4=0), stale = stored keys with k%14>=7, disjoint") {
    val s = spark
    val d = "/root/testdata/sf0.001"
    val got = RdfQueries.queries("rdf_enrich_stale")(s, d)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val missing = got.filter(_._2 == "missing").map(_._1)
    val stale = got.filter(_._2 == "stale").map(_._1)
    assert(missing.nonEmpty && stale.nonEmpty)
    assert((missing & stale).isEmpty)
    missing.foreach { mk =>
      val k = mk.toLong - 100000
      assert(k % 3 == 0 && k % 4 == 0, s"missing key $mk")
    }
    stale.foreach { mk =>
      val k = mk.toLong - 100000
      assert(k % 3 == 0 && k % 4 != 0 && k % 14 >= 7, s"stale key $mk")
    }
  }
}
