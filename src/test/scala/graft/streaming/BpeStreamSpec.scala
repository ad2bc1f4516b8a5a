package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.LlmQueries

/** Streaming twin of the frozen-merge BPE tokenizer: micro-batched
  * per-doc tokenization under the stored merge artifact must be
  * bit-equal to the batch probe regardless of the split, replays
  * must be no-ops, and probe totals must reconcile with the
  * corpus-level incremental query. */
class BpeStreamSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def writeShard(df: org.apache.spark.sql.DataFrame,
      dir: String, name: String, ageMs: Long = 0L): Unit = {
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/_stage-$name")
    val part = new java.io.File(s"$dir/_stage-$name").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    val dst = new java.io.File(s"$dir/$name.parquet")
    assert(part.renameTo(dst))
    assert(dst.setLastModified(System.currentTimeMillis() - ageMs))
  }

  private def storedMerges(): Seq[(String, String)] =
    spark.read.parquet(LlmQueries.bpeMergesPath(spark, sf))
      .orderBy(col("merge_rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  test("streaming twin: micro-batched tokenization == batch probe, " +
    "replay is a no-op") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val arriving = docs.filter(col("doc_id") % 10 === 7)
    val mergesPath = LlmQueries.bpeMergesPath(spark, sf)

    val dir = tmp("bpeprobe-in")
    writeShard(arriving.filter(col("doc_id") < 500L), dir, "shard0",
      ageMs = 60000L)
    writeShard(arriving.filter(col("doc_id") >= 500L), dir, "shard1")

    val out = tmp("bpeprobe-out")
    DocsStream.startBpeProbe(
      DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1)),
      mergesPath, out, tmp("bpeprobe-ckpt")).awaitTermination()

    val batch = LlmQueries.bpeProbe(arriving, storedMerges())
    assert(rows(spark.read.parquet(out).drop("batch_id")) === rows(batch))
    assert(batch.count() > 0)

    DocsStream.startBpeProbe(
      DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1)),
      mergesPath, out, tmp("bpeprobe-ckpt2")).awaitTermination()
    assert(rows(spark.read.parquet(out).drop("batch_id")) === rows(batch))
  }

  test("probe totals reconcile with the corpus-level incremental " +
    "query") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val arriving = docs.filter(col("doc_id") % 10 === 7)
    val perDoc = LlmQueries.bpeProbe(arriving, storedMerges())
      .groupBy(col("token")).agg(sum(col("n")).as("n_occ"))
    val corpus = LlmQueries.queries("llm_bpe_incremental")(spark, sf)
      .select(col("token"), col("n_occ"))
    assert(rows(perDoc) === rows(corpus))
  }
}
