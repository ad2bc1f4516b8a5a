package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The decision-stump trainer ([[LlmQueries.qualityStump]]) on a
  * corpus with KNOWN optimal stumps: perfect separation is found at
  * the right threshold and polarity, an inverted-label feature
  * selects the complementary polarity, and a non-separating feature
  * honestly reports its error floor. */
class QualityStumpSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  private def corpus(rows: (Long, String, String)*): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stump").toString
    rows.toSeq.map { case (id, text, lang) =>
      (id, text, lang, "s", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("perfect separation: stopword density splits en from xx at " +
    "the observed threshold, ge polarity, zero errors") {
    // en docs: 2 stopwords / 4 tokens -> stop_x1000 = 500
    // xx docs: 0 stopwords           -> stop_x1000 = 0
    val dir = corpus(
      (1L, "the cat is here", "en"),
      (2L, "the dog is there", "en"),
      (3L, "zork blag wump trox", "xx"),
      (4L, "klaat nikto barada gort", "xx"))
    val got = LlmQueries.qualityStump(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2),
        r.getLong(3)))).toMap
    // predict en iff stop_x1000 >= 500: zero errors
    assert(got("stop_x1000") == ((500L, "ge", 0L)))
    // totals carried
    val row = LlmQueries.qualityStump(spark, dir)
      .filter(org.apache.spark.sql.functions.col("feature") ===
        "stop_x1000").head
    assert(row.getLong(4) == 2L && row.getLong(5) == 2L)
  }

  test("inverted labels pick the lt polarity; a constant feature " +
    "reports the class-prior error floor") {
    // now the NON-en docs carry the stopwords: en iff stop < 250
    val dir = corpus(
      (1L, "zork blag wump trox", "en"),
      (2L, "klaat nikto barada gort", "en"),
      (3L, "gleep fnord quux zilch", "en"),
      (4L, "the dog is there", "xx"))
    val got = LlmQueries.qualityStump(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2),
        r.getLong(3)))).toMap
    assert(got("stop_x1000") == ((500L, "lt", 0L)))
    // every doc has 4 tokens: n_tokens cannot separate — the best
    // any threshold does is the minority class count (1 error)
    assert(got("n_tokens")._3 == 1L)
  }
}
