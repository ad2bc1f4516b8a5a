package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.LlmQueries

/** Streaming language-ID gate: micro-batched arrival over the same
  * stored counts artifact must classify exactly as one batch pass,
  * and a replay must be a no-op. */
class LangIdStreamSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def writeShard(df: org.apache.spark.sql.DataFrame,
      dir: String, name: String, ageMs: Long = 0L): Unit = {
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/_stage-$name")
    val part = new java.io.File(s"$dir/_stage-$name").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    val dst = new java.io.File(s"$dir/$name.parquet")
    assert(part.renameTo(dst))
    assert(dst.setLastModified(System.currentTimeMillis() - ageMs))
  }

  test("two micro-batches classify exactly as one batch pass over " +
    "the stored counts; replay is a no-op") {
    // the trained artifact (built from the labeled fixture once)
    val countsPath = LlmQueries.langIdCountsPath(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .limit(60).localCheckpoint()

    val dir = tmp("langid-in")
    writeShard(docs.filter(col("doc_id") % 2 === 0), dir, "shard0",
      ageMs = 60000L)
    writeShard(docs.filter(col("doc_id") % 2 === 1), dir, "shard1")

    val out = tmp("langid-out")
    val q = DocsStream.startLangIdGate(
      DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1)),
      countsPath, out, tmp("langid-ckpt"))
    q.awaitTermination()

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "pred", "win_score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val streamed = rows(spark.read.parquet(out))
    val batch = rows(LlmQueries.langIdScoreOf(
      LlmQueries.langIdGramsOf(docs),
      spark.read.parquet(countsPath), Nil))
    assert(streamed == batch && streamed.nonEmpty)
    assert(streamed.size == 60) // every doc classified exactly once

    // replay through a fresh checkpoint: no duplicates
    val q2 = DocsStream.startLangIdGate(
      DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1)),
      countsPath, out, tmp("langid-ckpt2"))
    q2.awaitTermination()
    val dups = spark.read.parquet(out).groupBy("doc_id").count()
      .filter(col("count") > 1).count()
    assert(dups == 0L, "replay duplicated classifications")
  }
}
