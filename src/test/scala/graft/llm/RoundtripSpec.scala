package graft.llm

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The CSV losslessness contract on ADVERSARIAL text — the synthetic
  * corpus is too clean to prove it: embedded newlines (DOS and
  * Unix), quotes, commas, leading/trailing spaces, empty strings,
  * and non-ASCII must all survive the write/read config pair
  * byte-for-byte. */
class RoundtripSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  test("csv config pair round-trips hostile text exactly") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "plain", "en", "a", 5L),
      (2L, "comma, inside", "en", "a", 13L),
      (3L, "quote \" and \"\"double\"\"", "en", "a", 21L),
      (4L, "line\nbreak and\r\ndos", "nl", "b", 19L),
      (5L, "  padded  ", "nl", "b", 10L),
      (6L, "", "de", "c", 0L),
      (7L, "unicode: žluťoučký 日本語 🙂", "de", "c", 24L),
      (8L, "backslash \\ and tab\there", "fr", "c", 24L))
    val df = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val path = Files.createTempDirectory("csv-rt").toFile
      .getAbsolutePath + "/docs"
    LlmQueries.csvWrite(df, path)
    val back = LlmQueries.csvRead(s, path)
      .as[(Long, String, String, String, Long)].collect().toSet
    assert(back === rows.toSet)

    // the streaming ingest twin reads the same files losslessly
    val outPath = Files.createTempDirectory("csv-rt-out").toFile
      .getAbsolutePath + "/out"
    graft.streaming.DocsStream
      .documentsCsv(s, path, maxFilesPerTrigger = Some(1))
      .writeStream
      .option("checkpointLocation", Files
        .createTempDirectory("csv-rt-ckpt").toFile.getAbsolutePath)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(outPath); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    val streamed = s.read.parquet(outPath)
      .as[(Long, String, String, String, Long)].collect().toSet
    assert(streamed === rows.toSet)
  }
}
