package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.rdf.Vocab._

/** The WEEKLY LIFECYCLE end-to-end, two consecutive runs composed
  * from the round's incremental pieces: week 1 publishes a full
  * snapshot + change log; between runs the upstream renames a
  * monument; week 2 runs INCREMENTALLY (TTL fetch list → refresh →
  * publishDelta) and a downstream consumer that only follows the
  * change log reconstructs week 2's published graph exactly. */
class PipelineLifecycleSpec extends AnyFunSuite {

  private val Mon = "https://monumenten.example.org/monument/"

  private val page =
    """@prefix dcterms: <http://purl.org/dc/terms/> .
      |@prefix ceo: <https://linkeddata.cultureelerfgoed.nl/def/ceo#> .
      |<http://x/1> dcterms:title "One"@nl .
      |<http://x/1> ceo:rijksmonumentnummer "11" .
      |<http://x/2> dcterms:title "Two"@nl .
      |<http://x/2> ceo:rijksmonumentnummer "22" .
      |""".stripMargin

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("week 1 full run + week 2 incremental run compose with the " +
    "CDC publish: change-log followers reconstruct week 2 exactly") {
    val spark = TestSpark.spark
    import spark.implicits._
    val base = Files.createTempDirectory("lifecycle").toFile.getAbsolutePath
    val snap = s"$base/published"
    val log = s"$base/changes"
    val p = page
    val mon = Mon

    // ---- week 1: full run; upstream has monument 11 as "Mill" ----
    def fetchWeek1(key: String): Seq[rdf.Turtle.FlatTriple] = Seq(
      ("default", mon + key, "iri", DctermsTitle,
        if (key == "11") "Mill" else "Hall", "literal", null, null),
      ("default", mon + key, "iri", RdfType, CeoRijksmonument, "iri",
        null, null))
    val week1 = Pipeline.run(spark,
      fetchPage = n => if (n == 1) p else "",
      fetchMonument = fetchWeek1, env = Map.empty)
    Pipeline.publishDelta(week1, snap, log, "week1")
    // the enrichment snapshot + ledger week 2 will consume: what the
    // week-1 fetches returned, every key fetched 7 days ago by now
    val storedEnrichment = Seq("11", "22").flatMap(fetchWeek1)
      .toDF("graph", "subject", "subject_kind", "predicate",
        "obj_value", "obj_kind", "obj_lang", "obj_datatype")
    val ledger = Seq(("11", 7), ("22", 7)).toDF("monument_key", "age_days")

    // ---- week 2: upstream renamed monument 11; incremental run ----
    val fetched2 = spark.sparkContext.collectionAccumulator[String]("w2")
    val week2 = Pipeline.runIncremental(spark,
      fetchPage = n => if (n == 1) p else "",
      fetchMonument = { key =>
        fetched2.add(key)
        Seq(
          ("default", mon + key, "iri", DctermsTitle,
            if (key == "11") "New Mill" else "Hall", "literal", null,
            null),
          ("default", mon + key, "iri", RdfType, CeoRijksmonument,
            "iri", null, null))
      },
      env = Map.empty, storedSnapshot = storedEnrichment,
      ledger = ledger, ttlDays = 7)
    Pipeline.publishDelta(
      Pipeline.Result(week2.triples, week2.conf, week2.prefixes),
      snap, log, "week2")

    // both keys were at the TTL boundary → both re-fetched (the
    // reference's weekly cadence reproduced by the incremental path)
    import scala.jdk.CollectionConverters._
    assert(fetched2.value.asScala.toSet == Set("11", "22"))
    // the published snapshot carries the rename, not the stale title
    val published = spark.read.parquet(snap)
    assert(published.filter(col("obj_value") === "Mill").count() == 0)
    assert(published.filter(col("obj_value") === "New Mill").count() == 1)

    // ---- consumer: reconstruct week 2 from the change log alone ----
    val changes = spark.read.parquet(log)
    val afterW1 = Pipeline.applyChanges(
      week1.triples.limit(0), // empty store
      changes.filter(col("run_id") === "week1"))
    val afterW2 = Pipeline.applyChanges(afterW1,
      changes.filter(col("run_id") === "week2"))
    assert(rows(afterW2) == rows(published) && rows(afterW2).nonEmpty)
    // and the week-2 diff is exactly the rename pair
    val w2changes = changes.filter(col("run_id") === "week2")
      .select(col("change"), col("obj_value")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(w2changes == Set(("added", "New Mill"), ("removed", "Mill")))
  }
}
