package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.LlmQueries

/** Streaming inverted-index maintenance: BM25 over the maintained
  * postings must equal the monolithic batch build for any shard
  * split — postings are per-document rows, so the union fold is the
  * exact merge — and refine under late shards (df/avgdl/N re-derive
  * from the merged index inside the scoring plan). */
class Bm25StreamSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private val queries = Seq(1 -> Seq("hash", "join"),
    2 -> Seq("slow", "scan"))

  private def writeShard(dir: String, name: String,
      lo: Long, hi: Long): Unit = {
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_stage-$name")
    val part = new java.io.File(s"$dir/_stage-$name").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    assert(part.renameTo(new java.io.File(s"$dir/$name.parquet")))
  }

  private def topk(postings: org.apache.spark.sql.DataFrame) =
    LlmQueries.bm25TopKOf(spark, postings, queries, 5)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet

  test("BM25 over maintained postings == batch build; late shards " +
    "re-rank to the new truth") {
    val dir = Files.createTempDirectory("bm25-docs").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("bm25-ckpt").toFile.getAbsolutePath
    val post = Files.createTempDirectory("bm25-post").toFile
      .getAbsolutePath + "/postings"
    writeShard(dir, "shard0", 0L, 60L)
    writeShard(dir, "shard1", 60L, 120L)

    def runOnce(): Unit = {
      val q = DocsStream.startPostingsMaintenance(
        DocsStream.documents(spark, dir, maxFilesPerTrigger = Some(1)),
        post, ckpt)
      q.awaitTermination()
    }

    runOnce()
    val batch = topk(LlmQueries.postingsOf(spark.read.parquet(dir)))
    assert(topk(DocsStream.readPostings(spark, post)) === batch &&
      batch.nonEmpty)

    writeShard(dir, "shard2", 120L, 200L)
    runOnce()
    assert(topk(DocsStream.readPostings(spark, post)) ===
      topk(LlmQueries.postingsOf(spark.read.parquet(dir))))
  }
}
