package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.{DedupIndex, LlmQueries}

/** O(delta) maintenance of the dedup band index — the MinHash twin
  * of AnnIndexExtendSpec: replay detection must be a bounded ledger
  * read, uncommitted (crashed) appends must be invisible to probes
  * and healed by the retry's dynamic overwrite, and nothing in the
  * extend path may scan the corpus-scale store. */
class DedupIndexExtendSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  test("an uncommitted (partial) band append is EXCLUDED from the " +
    "committed view a probe reads, and the retry's overwrite heals " +
    "it without duplicates") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val indexPath = tmp("ddext")
    DedupIndex.writeIndex(spark,
      docs.filter(!expr(LlmQueries.arrivingShardPred)), indexPath)
    val bands = s"$indexPath/bands"
    val backfill = spark.read.parquet(bands).count()

    // the crash window: batch 0's bands land, the ledger commit
    // never does
    val arriving = docs.filter(expr(LlmQueries.arrivingShardPred))
      .limit(50)
    val newBands = DedupIndex.docBands(arriving)
      .withColumn("lbl", col("doc_id"))
      .select("band", "bv", "doc_id", "lbl")
    BatchManifest.writeBatch(newBands, bands, 0L)
    assert(spark.read.parquet(bands).count() > backfill,
      "partial rows should be physically present")
    // ... but INVISIBLE through the committed view
    val visible = BatchManifest.committedOnly(spark, bands,
      spark.read.parquet(bands))
    assert(visible.count() == backfill,
      "a probe saw uncommitted partial bands")

    // the retry runs the full protocol: un-applied -> rewrite -> commit
    assert(!BatchManifest.applied(spark, bands, 0L))
    BatchManifest.writeBatch(newBands, bands, 0L)
    BatchManifest.commit(spark, bands, 0L)
    assert(BatchManifest.applied(spark, bands, 0L))
    val healed = BatchManifest.committedOnly(spark, bands,
      spark.read.parquet(bands))
    // every doc carries exactly its 4 band rows — the overwrite
    // replaced the partial partitions, never stacked on them
    val perDoc = healed.groupBy("doc_id").count()
      .filter(col("count") =!= 4L).count()
    assert(perDoc == 0L, "heal left a doc with != 4 band rows")
    assert(healed.count() == backfill + newBands.count())
  }

  test("the ledger is bounded by batch count and the committed-view " +
    "filter is partition pruning on batch_id, not a data scan") {
    val s = spark
    import s.implicits._
    val indexPath = tmp("ddext2")
    DedupIndex.writeIndex(spark,
      Seq((1L, "alpha bravo charlie delta echo foxtrot golf"))
        .toDF("doc_id", "text"), indexPath)
    val bands = s"$indexPath/bands"
    for (b <- 0L until 3L) {
      BatchManifest.writeBatch(
        DedupIndex.docBands(Seq((100L + b,
          s"unique shard $b text with its own words entirely"))
          .toDF("doc_id", "text"))
          .withColumn("lbl", col("doc_id"))
          .select("band", "bv", "doc_id", "lbl"), bands, b)
      BatchManifest.commit(spark, bands, b)
    }
    assert(spark.read.parquet(BatchManifest.path(bands)).count() == 3L)
    val view = BatchManifest.committedOnly(spark, bands,
      spark.read.parquet(bands))
    view.collect()
    // the filter compiles to a partition predicate: the scan's
    // partitionFilters mention batch_id, its dataFilters do not
    val scans = view.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty)
    assert(scans.forall(_.partitionFilters.exists(
      _.references.exists(_.name == "batch_id"))),
      "committedOnly must prune partitions")
    assert(scans.forall(!_.dataFilters.exists(
      _.references.exists(_.name == "batch_id"))),
      "batch_id leaked into data filters (a data scan)")
  }
}
