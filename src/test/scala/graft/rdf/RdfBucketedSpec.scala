package graft.rdf

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The 100 TB co-location claims of the SPARQL-parity operators,
  * executed on a real bucketed store (same discipline as
  * BucketedJoinSpec for rel_q03):
  *  - the star-BGP pivot's ONE exchange disappears entirely when the
  *    triple table is stored bucketed by subject;
  *  - a semi-naive reachability round against a src-bucketed edge
  *    table exchanges ONLY the frontier side.
  */
class RdfBucketedSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("star BGP pivot runs with ZERO exchanges on a subject-bucketed store") {
    try {
      TripleFixture.triples(spark, dir)
        .write.mode("overwrite").bucketBy(4, "subject")
        .saveAsTable("triples_b")
      val pivot = RdfQueries.bgpStarOf(spark.table("triples_b"))
      val plan = finalPlan(pivot)
      assert(!plan.contains("Exchange"),
        s"subject-bucketed pivot must not exchange:\n$plan")
      // and the answer is the same as over the unbucketed fixture
      val unbucketed = RdfQueries.bgpStarOf(TripleFixture.triples(spark, dir))
      assert(pivot.except(unbucketed).isEmpty &&
        unbucketed.except(pivot).isEmpty && !pivot.isEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS triples_b")
    }
  }

  test("the SPARQL TEXT front-end inherits the co-location: a parsed " +
      "star query runs with ZERO exchanges on the bucketed store") {
    try {
      TripleFixture.triples(spark, dir)
        .write.mode("overwrite").bucketBy(4, "subject")
        .saveAsTable("triples_fb")
      // a query STRING a user would hand rdflib's Graph.query(),
      // compiled against the bucketed table
      val compiled = SparqlSelect(spark.table("triples_fb"),
        """PREFIX def: <http://ex.org/def#>
          |SELECT ?item ?title ?part_size
          |WHERE { ?item a ceo:Rijksmonument ;
          |        dcterms:title ?title ;
          |        def:size ?part_size .
          |        FILTER(?part_size >= 10) }""".stripMargin)
      val plan = finalPlan(compiled)
      assert(!plan.contains("Exchange"),
        s"front-end pivot over a subject-bucketed store must not " +
          s"exchange:\n$plan")
      assert(compiled.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS triples_fb")
    }
  }

  test("semi-naive round against src-bucketed edges exchanges only the frontier") {
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      TripleFixture.triples(spark, dir)
        .filter(col("predicate") === Vocab.DctermsRelation &&
          col("obj_kind") === "iri")
        .select(col("subject").as("src"), col("obj_value").as("dst"))
        .write.mode("overwrite").bucketBy(4, "src")
        .sortBy("src").saveAsTable("edges_b")
      val edges = spark.table("edges_b")
      val frontier = TripleFixture.triples(spark, dir)
        .filter(col("predicate") === Vocab.RdfType &&
          col("obj_value") === Vocab.CeoRijksmonument)
        .select(col("subject").as("f_src"), col("subject").as("f_dst"))
        .distinct()
      val round = frontier.join(edges, col("f_dst") === col("src"))
        .select(col("f_src"), col("dst"))
      val plan = finalPlan(round)
      // the corpus-scale edge side must ride its bucket layout into
      // the join with NO exchange (its scan reports Bucketed: true
      // and feeds the join's sort directly); every Exchange in the
      // plan keys on the frontier's columns (the distinct + the
      // re-key toward the bucket layout) — frontier-sized, the cost
      // the scale notes accept per round
      assert(plan.contains("Bucketed: true"), plan)
      assert(!plan.contains("Exchange hashpartitioning(src"), plan)
      val exchanges = "Exchange hashpartitioning\\(f_"
        .r.findAllIn(plan).length
      val all = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(all == exchanges && all >= 1,
        s"every exchange must be frontier-keyed:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS edges_b")
    }
  }

  test("publish(format=bucketed) writes the subject-bucketed store " +
    "the zero-exchange pivot consumes; re-publish overwrites in place") {
    val path = java.nio.file.Files.createTempDirectory("graft-bpub")
      .toFile.getAbsolutePath
    val table = graft.Pipeline.bucketedTableName(path)
    val triples = TripleFixture.triples(spark, dir)
    val result = graft.Pipeline.Result(triples,
      graft.config.EtlConf.fromEnv(Map.empty), Map.empty)
    try {
      graft.Pipeline.publish(result, path, format = "bucketed")
      val stored = spark.table(table)
      // bucketing metadata survived the publish: the pivot plans
      // zero exchanges against the PUBLISHED table, not a re-write
      val pivot = RdfQueries.bgpStarOf(stored)
      val plan = finalPlan(pivot)
      assert(!plan.contains("Exchange"),
        s"published bucketed store must pivot exchange-free:\n$plan")
      // content parity with the unbucketed publish
      assert(stored.except(triples).isEmpty &&
        triples.except(stored).isEmpty)
      // the weekly overwrite-publish: same path, same table, fresh
      // content lands (idempotent re-publish, no duplicate rows)
      graft.Pipeline.publish(result, path, format = "bucketed")
      assert(spark.table(table).count() == triples.count())
      // cluster deploys size the frozen-in bucket count per publish:
      // the conf override must reach the table spec
      spark.conf.set("spark.graft.publish.buckets", "8")
      try {
        graft.Pipeline.publish(result, path, format = "bucketed")
        val ddl = spark.sql(s"SHOW CREATE TABLE $table")
          .collect()(0).getString(0)
        assert(ddl.contains("8 BUCKETS"), ddl)
      } finally spark.conf.unset("spark.graft.publish.buckets")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }
}
