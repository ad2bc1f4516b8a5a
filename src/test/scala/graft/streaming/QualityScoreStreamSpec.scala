package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.LlmQueries

/** Streaming twin of the learned quality scorer: micro-batched
  * scoring against the stored weight artifact must be bit-equal to
  * the batch score over the same documents regardless of the
  * split, replays must be no-ops, and swapping the weight artifact
  * changes the verdicts of SUBSEQUENT batches (the retrain seam). */
class QualityScoreStreamSpec extends AnyFunSuite {

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

  test("streaming twin: micro-batched scoring == batch score, " +
    "replay is a no-op") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val arriving = docs.filter(col("doc_id") % 10 === 3)
    val wPath = LlmQueries.qualityWeightsPath(spark, sf)
    val weights = spark.read.parquet(wPath)

    val dir = tmp("qscore-in")
    writeShard(arriving.filter(col("doc_id") < 500L), dir, "shard0",
      ageMs = 60000L)
    writeShard(arriving.filter(col("doc_id") >= 500L), dir, "shard1")

    val out = tmp("qscore-out")
    DocsStream.startQualityScore(
      DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1)),
      wPath, out, tmp("qscore-ckpt")).awaitTermination()

    val batch = LlmQueries.qualityScoreOf(arriving, weights)
    assert(rows(spark.read.parquet(out).drop("batch_id")) === rows(batch))
    assert(batch.count() > 0)

    // at-least-once replay through a fresh checkpoint
    DocsStream.startQualityScore(
      DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1)),
      wPath, out, tmp("qscore-ckpt2")).awaitTermination()
    assert(rows(spark.read.parquet(out).drop("batch_id")) === rows(batch))
  }

  test("the retrain seam: a swapped weight artifact rescoring the " +
    "same shard yields flipped verdicts") {
    val s = spark
    import s.implicits._
    val doc = Seq((9001L,
      "the cat is in the hat and the dog is in the yard", "en", "s",
      0L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmp("qswap-in")
    writeShard(doc, dir, "shard0")

    def w(stop: Long) = Seq(("bias", -1000L), ("stop_x1000", stop),
      ("mean_wordlen_x100", 0L), ("punct_x1000", 0L),
      ("n_tokens", 0L)).toDF("feature", "w")
    val wPath = tmp("qswap-w")
    w(10L).write.mode("overwrite").parquet(wPath)
    val out1 = tmp("qswap-out1")
    DocsStream.startQualityScore(DocsStream.documents(spark, dir),
      wPath, out1, tmp("qswap-ckpt1")).awaitTermination()
    assert(spark.read.parquet(out1).head.getLong(2) == 1L)

    // retrain: overwrite the artifact, score a fresh stream
    w(-10L).write.mode("overwrite").parquet(wPath)
    val out2 = tmp("qswap-out2")
    DocsStream.startQualityScore(DocsStream.documents(spark, dir),
      wPath, out2, tmp("qswap-ckpt2")).awaitTermination()
    assert(spark.read.parquet(out2).head.getLong(2) == 0L)
  }
}
