package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.LlmQueries

/** Streaming twin of the frozen-vocabulary unigram tokenizer:
  * micro-batched per-doc Viterbi tokenization under the stored
  * weighted-vocabulary artifact must be bit-equal to the batch
  * probe regardless of the split, replays must be no-ops, and probe
  * totals must reconcile with the corpus-level incremental query. */
class UnigramStreamSpec extends AnyFunSuite {

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

  test("streaming twin: micro-batched tokenization == batch probe, " +
    "replay is a no-op") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val arriving = docs.filter(col("doc_id") % 10 === 7)
    val vocabPath = tmp("uniprobe-vocab")
    LlmQueries.buildUnigramVocab(spark, sf, vocabPath)
    val vocab = spark.read.parquet(vocabPath)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val dir = tmp("uniprobe-in")
    writeShard(arriving.filter(col("doc_id") < 500L), dir, "shard0",
      ageMs = 60000L)
    writeShard(arriving.filter(col("doc_id") >= 500L), dir, "shard1")

    val out = tmp("uniprobe-out")
    DocsStream.startUnigramProbe(
      DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1)),
      vocabPath, out, tmp("uniprobe-ckpt")).awaitTermination()

    val batch = LlmQueries.unigramProbe(arriving, vocab)
    assert(rows(spark.read.parquet(out).drop("batch_id")) === rows(batch))
    assert(batch.count() > 0)

    DocsStream.startUnigramProbe(
      DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1)),
      vocabPath, out, tmp("uniprobe-ckpt2")).awaitTermination()
    assert(rows(spark.read.parquet(out).drop("batch_id")) === rows(batch))
  }

  test("probe totals reconcile with the corpus-level incremental " +
    "query") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val arriving = docs.filter(col("doc_id") % 10 === 7)
    val vocab = LlmQueries.baseUnigramVocab(spark, sf)
    val perDoc = LlmQueries.unigramProbe(arriving, vocab)
      .groupBy(col("token")).agg(sum(col("n")).as("n_occ"))
    val corpus = LlmQueries.queries("llm_unigram_incremental")(
      spark, sf).select(col("token"), col("n_occ"))
    assert(rows(perDoc) === rows(corpus))
  }

  test("a retrain swap takes effect at the next batch") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val arriving = docs.filter(col("doc_id") % 10 === 7).limit(20)
    val vocabPath = tmp("uniprobe-vocab2")
    LlmQueries.buildUnigramVocab(spark, sf, vocabPath)

    val dir = tmp("uniprobe-in2")
    writeShard(arriving, dir, "shard0")
    val out = tmp("uniprobe-out2")
    DocsStream.startUnigramProbe(
      DocsStream.documents(spark, dir), vocabPath, out,
      tmp("uniprobe-ckpt3")).awaitTermination()
    val before = rows(spark.read.parquet(out)
      .groupBy(col("token")).agg(sum(col("n"))))

    // retrain: chars only, every gram weight 1 — segmentations and
    // token identities change for any multi-char-gram word
    val s2 = spark
    import s2.implicits._
    val charsOnly = LlmQueries.baseUnigramVocab(spark, sf)
      .filter(_._1.length == 1).map { case (g, _) => (g, 1L) }
    charsOnly.toSeq.toDF("g", "n").coalesce(1)
      .write.mode("overwrite").parquet(vocabPath)

    val dir2 = tmp("uniprobe-in3")
    writeShard(arriving, dir2, "shard0")
    val out2 = tmp("uniprobe-out3")
    DocsStream.startUnigramProbe(
      DocsStream.documents(spark, dir2), vocabPath, out2,
      tmp("uniprobe-ckpt4")).awaitTermination()
    val after = rows(spark.read.parquet(out2)
      .groupBy(col("token")).agg(sum(col("n"))))
    assert(before !== after)
  }
}
