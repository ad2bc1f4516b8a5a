package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.rdf.Vocab._

/** [[Pipeline.runIncremental]]: the weekly run proportional to
  * CHANGE — only never-fetched and TTL-stale monuments are fetched,
  * an upstream edit on a stale monument propagates into the final
  * triples (replacing the old value), a fresh monument's enrichment
  * survives from the stored snapshot with ZERO fetches, and the
  * returned ledger/snapshot are exactly what the next run needs. */
class PipelineIncrementalSpec extends AnyFunSuite {

  private val Mon = "https://monumenten.example.org/monument/"

  // export: three monuments — 11 stale (age 9), 22 fresh (age 2),
  // 33 never fetched
  private val page =
    """@prefix dcterms: <http://purl.org/dc/terms/> .
      |@prefix ceo: <https://linkeddata.cultureelerfgoed.nl/def/ceo#> .
      |<http://x/1> dcterms:title "One"@nl .
      |<http://x/1> ceo:rijksmonumentnummer "RM11" .
      |<http://x/2> dcterms:title "Two"@nl .
      |<http://x/2> ceo:rijksmonumentnummer "22" .
      |<http://x/3> dcterms:title "Three"@nl .
      |<http://x/3> ceo:rijksmonumentnummer "33" .
      |""".stripMargin

  test("incremental run: fetches = missing + stale only; stale edit " +
    "propagates; fresh enrichment survives unfetched; ledger resets " +
    "attempted keys") {
    val spark = TestSpark.spark
    import spark.implicits._
    val snapshot = Seq(
      // stored from previous runs: monument 11 with the OLD name,
      // 22 current; both typed; 33 absent (never fetched)
      ("default", Mon + "11", "iri", DctermsTitle, "Old One", "literal",
        null, null),
      ("default", Mon + "11", "iri", RdfType, CeoRijksmonument, "iri",
        null, null),
      ("default", Mon + "22", "iri", DctermsTitle, "Hall Two", "literal",
        null, null),
      ("default", Mon + "22", "iri", RdfType, CeoRijksmonument, "iri",
        null, null))
      .toDF("graph", "subject", "subject_kind", "predicate",
        "obj_value", "obj_kind", "obj_lang", "obj_datatype")
    val ledger = Seq(("11", 9), ("22", 2)).toDF("monument_key", "age_days")
    val fetchedKeys = spark.sparkContext
      .collectionAccumulator[String]("inc-keys")
    // locals: keep the spec instance out of executor closures
    val p = page
    val mon = Mon
    val result = Pipeline.runIncremental(
      spark,
      fetchPage = n => if (n == 1) p else "",
      fetchMonument = { key =>
        fetchedKeys.add(key)
        key match {
          case "11" => Seq( // upstream renamed monument 11
            ("default", mon + "11", "iri", DctermsTitle, "New One",
              "literal", null, null),
            ("default", mon + "11", "iri", RdfType, CeoRijksmonument,
              "iri", null, null))
          case "33" => Seq(
            ("default", mon + "33", "iri", DctermsTitle, "Fresh Three",
              "literal", null, null))
          // a fresh key showing up here is caught by the accumulator
          // assertion below (this closure must stay serializable)
          case k => throw new RuntimeException(s"unexpected fetch $k")
        }
      },
      env = Map.empty,
      storedSnapshot = snapshot,
      ledger = ledger,
      ttlDays = 7)

    // exactly the missing (33) + stale (11) keys were fetched
    import scala.jdk.CollectionConverters._
    assert(fetchedKeys.value.asScala.toSet == Set("11", "33"))
    val fl = result.fetchList.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(fl == Set(("33", "missing"), ("11", "stale")))

    // the refreshed snapshot: edit landed, old row gone, fresh kept
    val snapTitles = result.snapshot
      .filter(col("predicate") === DctermsTitle)
      .select("subject", "obj_value").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(snapTitles == Set((Mon + "11", "New One"),
      (Mon + "22", "Hall Two"), (Mon + "33", "Fresh Three")))

    // ...and into the FINAL published triples (enrich unions the
    // snapshot in): the stale title is nowhere, the new one is there
    assert(result.triples
      .filter(col("obj_value") === "Old One").count() == 0)
    assert(result.triples
      .filter(col("subject") === Mon + "11" &&
        col("obj_value") === "New One").count() == 1)
    // fresh monument's stored enrichment is present without a fetch
    assert(result.triples
      .filter(col("subject") === Mon + "22" &&
        col("obj_value") === "Hall Two").count() == 1)

    // ledger for the next run: attempted keys at 0, fresh untouched
    val l2 = result.ledger.collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(l2 == Set(("11", 0), ("22", 2), ("33", 0)))
  }
}
