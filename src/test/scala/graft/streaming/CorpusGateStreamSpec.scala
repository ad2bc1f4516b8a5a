package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.LlmQueries

/** Streaming twins for the corpus-gate wave (robots.txt verdicts,
  * HTML boilerplate blocks, NFC normalization, the own-inflater
  * round-trip): all four are row-local given their slow-changing
  * dimensions, so the stream over accumulated shards must be
  * BIT-EQUAL to the batch query over the same directory, and a late
  * shard must land incrementally (only its rows appended). The
  * robots rule ARRAY is the dimension a streaming gate re-reads per
  * micro-batch — here static across the run, exactly like the
  * stored BPE merge list in the tokenizer twin. */
class CorpusGateStreamSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def writeShard(dir: String, name: String,
      lo: Long, hi: Long): Unit = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_stage-$name")
    val part = new java.io.File(s"$dir/_stage-$name").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    assert(part.renameTo(new java.io.File(s"$dir/$name.parquet")))
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  /** foreachBatch runner: apply `f` per micro-batch, append to
    * parquet at `out`. */
  private def runGate(dir: String, ckpt: String, out: String,
      f: DataFrame => DataFrame): Unit = {
    val q = DocsStream.documents(spark, dir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        f(batch).write.mode("append").parquet(out)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("streamed robots verdicts equal batch under a static rule " +
    "dimension, and a late shard lands incrementally") {
    val dir = Files.createTempDirectory("rb-docs").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("rb-ckpt").toFile.getAbsolutePath
    val out = Files.createTempDirectory("rb-out").toFile.getAbsolutePath
    writeShard(dir, "shard0", 0L, 70L)
    writeShard(dir, "shard1", 70L, 140L)
    // the slow dimension: rules parsed from the FULL corpus domains
    val ruleArr = LlmQueries.robotsRuleArrOf(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    ruleArr.cache()

    def gate(b: DataFrame) =
      LlmQueries.robotsGateOf(LlmQueries.docPathsOf(b), ruleArr)

    runGate(dir, ckpt, out, gate)
    val batch1 = rows(gate(spark.read.parquet(dir)))
    assert(rows(spark.read.parquet(out)) == batch1 && batch1.nonEmpty)

    writeShard(dir, "shard2", 140L, 200L)
    runGate(dir, ckpt, out, gate)
    val batch2 = rows(gate(spark.read.parquet(dir)))
    assert(rows(spark.read.parquet(out)) == batch2)
    assert(batch2.size > batch1.size) // the late shard actually landed
    ruleArr.unpersist()
  }

  test("streamed HTML block gate and NFC normalization equal batch " +
    "over the same shards") {
    val dir = Files.createTempDirectory("hb-docs").toFile.getAbsolutePath
    writeShard(dir, "shard0", 0L, 80L)
    writeShard(dir, "shard1", 80L, 160L)
    for ((name, f) <- Seq[(String, DataFrame => DataFrame)](
        ("blocks", LlmQueries.htmlBlocksOf),
        ("nfc", LlmQueries.textNormalizeOf),
        ("inflate", LlmQueries.inflateOf))) {
      val ckpt = Files.createTempDirectory(s"hb-ckpt-$name")
        .toFile.getAbsolutePath
      val out = Files.createTempDirectory(s"hb-out-$name")
        .toFile.getAbsolutePath
      runGate(dir, ckpt, out, f)
      val streamed = rows(spark.read.parquet(out))
      val batch = rows(f(spark.read.parquet(dir)))
      assert(streamed == batch && streamed.nonEmpty, name)
    }
  }
}
