package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.LlmQueries

/** Streaming twin of the frozen-vocabulary tokenizer: micro-batched
  * probe output must be bit-equal to the batch wordpieceProbe over
  * the same documents regardless of the split, replays must be
  * no-ops, and the stored-vocabulary artifact must reproduce the
  * in-memory derivation. */
class WordpieceStreamSpec extends AnyFunSuite {

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

  test("stored vocabulary artifact round-trips the derivation") {
    val path = tmp("wp-vocab")
    LlmQueries.buildWordpieceVocab(spark, sf, path)
    val stored = spark.read.parquet(path)
      .collect().map(_.getString(0)).toSet
    assert(stored === LlmQueries.baseWordpieceVocab(spark, sf))
    assert(stored.nonEmpty)
  }

  test("streaming twin: micro-batched tokenization == batch probe, " +
      "replay is a no-op") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val arriving = docs.filter(col("doc_id") % 10 === 7)
    val vocabPath = tmp("wp-vocab2")
    LlmQueries.buildWordpieceVocab(spark, sf, vocabPath)
    val vocab = spark.read.parquet(vocabPath)
      .collect().map(_.getString(0)).toSet

    val dir = tmp("wpprobe-in")
    val mid = 500L
    writeShard(arriving.filter(col("doc_id") < mid), dir, "shard0",
      ageMs = 60000L)
    writeShard(arriving.filter(col("doc_id") >= mid), dir, "shard1")

    val out = tmp("wpprobe-out")
    DocsStream.startWordpieceProbe(
      DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1)),
      vocabPath, out, tmp("wpprobe-ckpt")).awaitTermination()

    val batch = LlmQueries.wordpieceProbe(arriving, vocab)
    assert(rows(spark.read.parquet(out).drop("batch_id")) === rows(batch))
    assert(batch.count() > 0)

    // at-least-once replay through a fresh checkpoint
    DocsStream.startWordpieceProbe(
      DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1)),
      vocabPath, out, tmp("wpprobe-ckpt2")).awaitTermination()
    assert(rows(spark.read.parquet(out).drop("batch_id")) === rows(batch))
  }

  test("probe totals reconcile with the corpus-level incremental " +
      "query") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val arriving = docs.filter(col("doc_id") % 10 === 7)
    val vocab = LlmQueries.baseWordpieceVocab(spark, sf)
    val perDoc = LlmQueries.wordpieceProbe(arriving, vocab)
      .groupBy(col("token")).agg(sum(col("n")).as("n_occ"))
    val corpus = LlmQueries.wordpieceIncremental(spark, sf)
      .select(col("token"), col("n_occ"))
    assert(rows(perDoc) === rows(corpus))
  }
}
