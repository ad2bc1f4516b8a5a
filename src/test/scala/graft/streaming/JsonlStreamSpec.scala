package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.LlmQueries
import graft.sources.JsonlDocs

/** JSONL ingest boundary in streaming form: shards arriving as
  * JSON-Lines files flow through the same hygiene gates as parquet
  * shards, with stream == batch over the accumulated directory. */
class JsonlStreamSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  /** Write a slice of the real documents table into `dir` as one
    * JSONL shard. */
  private def writeShard(dir: String, name: String,
      lo: Long, hi: Long): Unit = {
    import org.apache.spark.sql.functions.col
    val stage = s"$dir/_stage-$name"
    JsonlDocs.write(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(col("doc_id") >= lo && col("doc_id") < hi).coalesce(1),
      stage)
    val part = new java.io.File(stage).listFiles()
      .find(f => f.getName.startsWith("part-")).get
    assert(part.renameTo(new java.io.File(s"$dir/$name.jsonl")))
  }

  test("JSONL stream through the quality gate equals batch; late shard " +
    "lands incrementally") {
    val dir = Files.createTempDirectory("jsonl-stream").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("jsonl-ckpt").toFile.getAbsolutePath
    val out = Files.createTempDirectory("jsonl-out").toFile.getAbsolutePath
    writeShard(dir, "shard0", 0L, 60L)
    writeShard(dir, "shard1", 60L, 120L)

    def runOnce(): Unit = {
      val q = DocsStream.qualityFiltered(
          DocsStream.documentsJsonl(spark, dir))
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    runOnce()
    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = LlmQueries.qualityFilterOf(
        JsonlDocs.read(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)

    // late JSONL shard: the next run appends ONLY its rows
    writeShard(dir, "shard2", 120L, 180L)
    runOnce()
    val after = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batchAll = LlmQueries.qualityFilterOf(JsonlDocs.read(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after == batchAll)
    assert((after -- streamed).forall(_._1 >= 120L))
  }

  test("parquet and JSONL shards of the same slice gate identically") {
    val pqDir = Files.createTempDirectory("tw-pq").toFile.getAbsolutePath
    val jlDir = Files.createTempDirectory("tw-jl").toFile.getAbsolutePath
    import org.apache.spark.sql.functions.col
    val slice = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 100L)
    slice.write.mode("overwrite").parquet(pqDir)
    JsonlDocs.write(slice, jlDir)
    val viaPq = LlmQueries.qualityFilterOf(spark.read.parquet(pqDir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaJl = LlmQueries.qualityFilterOf(JsonlDocs.read(spark, jlDir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaPq == viaJl && viaPq.nonEmpty)
  }
}
