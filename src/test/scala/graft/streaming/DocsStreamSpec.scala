package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.LlmQueries

/** Streaming corpus hygiene: the stream over accumulated shards must
  * equal the batch filters over the same directory, and a late shard
  * must be processed incrementally (only its rows appended). */
class DocsStreamSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  /** Copy a slice of the real documents table into `dir` as one
    * shard file. */
  private def writeShard(dir: String, name: String,
      lo: Long, hi: Long): Unit = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_stage-$name")
    // move the part file in as a single atomic-ish shard drop
    val part = new java.io.File(s"$dir/_stage-$name").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    assert(part.renameTo(new java.io.File(s"$dir/$name.parquet")))
  }

  test("streamed hygiene filters equal batch over the same shards, " +
    "and a late shard lands incrementally") {
    val dir = Files.createTempDirectory("docs-stream").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("docs-ckpt").toFile.getAbsolutePath
    val out = Files.createTempDirectory("docs-out").toFile.getAbsolutePath
    writeShard(dir, "shard0", 0L, 60L)
    writeShard(dir, "shard1", 60L, 120L)

    def runOnce(): Unit = {
      val q = DocsStream.qualityFiltered(DocsStream.documents(spark, dir))
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
    val batch = LlmQueries.qualityFilterOf(spark.read.parquet(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)

    // late shard: next run processes ONLY the new file
    writeShard(dir, "shard2", 120L, 180L)
    runOnce()
    val after = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batchAll = LlmQueries.qualityFilterOf(spark.read.parquet(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after == batchAll)
    assert((after -- streamed).forall(_._1 >= 120L))
  }

  test("blocklist filter over a stream equals its batch form") {
    val dir = Files.createTempDirectory("docs-bl").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("docs-bl-ckpt").toFile.getAbsolutePath
    val out = Files.createTempDirectory("docs-bl-out").toFile.getAbsolutePath
    writeShard(dir, "shard0", 0L, 200L)
    val q = DocsStream.blocklistFiltered(DocsStream.documents(spark, dir))
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", out)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = LlmQueries.termFilterOf(spark.read.parquet(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("bloom decontamination gate over a stream equals its batch form " +
    "(stream-static join against the 1-row bitset)") {
    val dir = Files.createTempDirectory("docs-bloom").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("docs-bloom-ckpt").toFile
      .getAbsolutePath
    val out = Files.createTempDirectory("docs-bloom-out").toFile
      .getAbsolutePath
    writeShard(dir, "shard0", 0L, 100L)
    writeShard(dir, "shard1", 100L, 200L)
    // static side: the heldout bitset of the full snapshot
    val bits = LlmQueries.bloomBitset(spark, "/root/testdata/sf0.001")
    val q = DocsStream
      .bloomDecontaminated(DocsStream.documents(spark, dir), bits)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", out)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.read.parquet(out).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val batch = LlmQueries.bloomCleanOf(spark.read.parquet(dir), bits)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(streamed == batch && streamed.nonEmpty)
    // the gate actually dropped something (heldout doc 0 is in the
    // shard range and shares its own grams)
    val all = spark.read.parquet(dir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(streamed != all)
  }
}
