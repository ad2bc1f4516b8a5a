package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.rdf.Vocab._

/** `Pipeline.fromEnv`: the reference's exact workflow env block
  * (muurschilderingendatabase-etl.yml:3–8,55–64 +
  * export_from_omeka_s.py:13–21) assembles into one run+publish, with
  * the reference's own defaults when vars are absent and config
  * problems surfaced as warnings, not crashes. */
class PipelineEnvSpec extends AnyFunSuite {

  // the workflow's env, verbatim (ARTIFACT_PATH feeds TARGET_FILEPATH)
  private def workflowEnv(target: String) = Map(
    "BASE_URI" -> "https://muurschilderingendatabase.nl/",
    "PROJECT_NAME" -> "Muurschilderingendatabase ETL",
    "GRAPH_ID" -> "muurschilderingen-latest-graph",
    "TARGET_FILEPATH" -> target,
    "FILTER_O_ISPUBLIC" -> "http://omeka.org/s/vocabs/o#is_public",
    "FILTER_O_RESOURCECLASS" -> "http://omeka.org/s/vocabs/o#resource_class",
    "FILTER_O_RESOURCE_TEMPLATE" ->
      "http://omeka.org/s/vocabs/o#resource_template",
    "MAP_DCTERMS_TITLE" -> "SDO.name")

  private val page1 =
    """@prefix dcterms: <http://purl.org/dc/terms/> .
      |@prefix o: <http://omeka.org/s/vocabs/o#> .
      |<http://x/1> dcterms:title "Fresco"@nl .
      |<http://x/1> o:is_public "true" .
      |<http://x/1> o:resource_class <http://x/rc> .
      |""".stripMargin

  test("the workflow env block resolves to the reference's run shape") {
    val plan = Pipeline.planFromEnv(workflowEnv("artifact-data.ttl"))
    assert(plan.baseUri == "https://muurschilderingendatabase.nl/")
    assert(plan.targetFilepath == "artifact-data.ttl")
    assert(plan.format == "turtle") // OUTPUT_FILE_FORMAT defaults 'ttl'
    assert(plan.graphId == "muurschilderingen-latest-graph")
    assert(plan.enrichmentUrlPrefix ==
      Pipeline.DefaultEnrichmentUrlPrefix)
    assert(plan.warnings.isEmpty)
  }

  test("defaults match export_from_omeka_s.py when env is empty") {
    val plan = Pipeline.planFromEnv(Map.empty)
    assert(plan == Pipeline.EnvPlan(
      "https://muurschilderingendatabase.nl/", "api-export.ttl",
      "turtle", "default", Pipeline.DefaultEnrichmentUrlPrefix, Nil))
  }

  test("unknown format throws; non-UTF-8 encoding warns but runs") {
    intercept[IllegalArgumentException] {
      Pipeline.planFromEnv(Map("OUTPUT_FILE_FORMAT" -> "xml"))
    }
    val plan = Pipeline.planFromEnv(Map("ENCODING" -> "latin-1"))
    assert(plan.warnings.exists(_.contains("latin-1")))
    assert(Pipeline.planFromEnv(Map("ENCODING" -> "UTF-8")).warnings.isEmpty)
  }

  test("fromEnv runs the workflow env end-to-end: graph id threads " +
    "through, filters/mapping apply, publish lands on TARGET_FILEPATH") {
    val spark = TestSpark.spark
    val out = Files.createTempDirectory("env-run").toFile.getAbsolutePath +
      "/artifact-data.ttl"
    val p1 = page1
    val (plan, result) = Pipeline.fromEnv(
      spark, workflowEnv(out),
      fetchPage = p => if (p == 1) p1 else "",
      fetchMonument = _ => Seq.empty)
    assert(plan.warnings.isEmpty && result.conf.warnings.isEmpty)
    val got = result.triples.collect()
      .map(r => (r.getString(0), r.getString(3), r.getString(4))).toSet
    // graph id from env on every row; title renamed (MAP_), the two
    // o: predicates deleted (FILTER_)
    assert(got == Set(
      ("muurschilderingen-latest-graph", SdoName, "Fresco")))
    // the publish artifact exists at TARGET_FILEPATH and re-parses
    val back = spark.read.format("turtle")
      .option("graph", plan.graphId).load(out)
    assert(back.count() == 1)
  }
}
