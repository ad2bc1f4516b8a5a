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

    // metrics: 3 keys total, 2 attempted (missing 33 + stale 11),
    // 1 fresh skipped, all attempted fetches succeeded
    assert(result.metrics ==
      Pipeline.FetchMetrics(keysTotal = 3, attempted = 2,
        skippedFresh = 1, fetched = 2, failed = 0))
  }

  test("ledger aging + failure metering: unfetched keys age by " +
    "elapsedDays and cross the TTL on a later run; a failing key is " +
    "counted failed and skipped, not silently dropped") {
    val spark = TestSpark.spark
    import spark.implicits._
    val p = page
    val mon = Mon
    def fetcher(failKeys: Set[String])(key: String)
        : Seq[rdf.Turtle.FlatTriple] = {
      if (failKeys.contains(key))
        throw new RuntimeException(s"upstream 500 for $key")
      Seq(("default", mon + key, "iri", DctermsTitle, s"T$key",
        "literal", null, null))
    }
    val snapshot = Seq(
      ("default", Mon + "11", "iri", DctermsTitle, "Old One", "literal",
        null, null),
      ("default", Mon + "22", "iri", DctermsTitle, "Hall Two", "literal",
        null, null))
      .toDF("graph", "subject", "subject_kind", "predicate",
        "obj_value", "obj_kind", "obj_lang", "obj_datatype")
    val ledger = Seq(("11", 9), ("22", 2)).toDF("monument_key", "age_days")
    val fail11 = Set("11")
    // run A, 3 days after the ledger was written: 11 aged to 12
    // (stale, attempted, FAILS), 22 aged to 5 (fresh, skipped),
    // 33 missing (attempted, succeeds)
    val runA = Pipeline.runIncremental(spark,
      fetchPage = n => if (n == 1) p else "",
      fetchMonument = fetcher(fail11),
      env = Map.empty, storedSnapshot = snapshot, ledger = ledger,
      ttlDays = 7, elapsedDays = 3)
    assert(runA.metrics ==
      Pipeline.FetchMetrics(keysTotal = 3, attempted = 2,
        skippedFresh = 1, fetched = 1, failed = 1))
    // the failed key's stored enrichment survives (skip-and-continue)
    assert(runA.snapshot.filter(col("obj_value") === "Old One")
      .count() == 1)
    // unfetched 22 AGED 2→5 (not frozen at 2); attempted keys at 0
    val lA = runA.ledger.collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(lA == Set(("11", 0), ("22", 5), ("33", 0)))
    // run B, 3 more days: 22 ages 5→8 and finally crosses the TTL —
    // the aging is what makes a perpetually-fresh key impossible
    val runB = Pipeline.runIncremental(spark,
      fetchPage = n => if (n == 1) p else "",
      fetchMonument = fetcher(Set.empty),
      env = Map.empty, storedSnapshot = runA.snapshot,
      ledger = runA.ledger, ttlDays = 7, elapsedDays = 3)
    val flB = runB.fetchList.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(flB == Set(("22", "stale")))
    assert(runB.metrics ==
      Pipeline.FetchMetrics(keysTotal = 3, attempted = 1,
        skippedFresh = 2, fetched = 1, failed = 0))
    val lB = runB.ledger.collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(lB == Set(("11", 3), ("22", 0), ("33", 3)))
  }
}
