package graft.llm

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The learned quality scorer ([[LlmQueries.qualityScoreOf]]): the
  * model is the WEIGHTS, not the code — seeded weight flips must
  * flip verdicts through the same plan, and inference is exact
  * integer arithmetic (a hand-computed dot product matches). */
class QualityScoreSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  // doc 1: stopword-rich, no punctuation; doc 2: the opposite
  private val docsDf = Seq(
    (1L, "the cat is in the hat and the dog is in the yard", "en",
      "s", 0L),
    (2L, "zap!!! pow... bang;;; crash,,, boom::: wham??? zing!!!",
      "en", "s", 0L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def weights(rows: (String, Long)*) =
    rows.toDF("feature", "w")

  private def verdicts(w: org.apache.spark.sql.DataFrame) =
    LlmQueries.qualityScoreOf(docsDf, w).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("seeded weight flip flips the verdicts; plan is weight-" +
    "agnostic") {
    // reward stopwords, punish punctuation → doc 1 kept, doc 2 not
    val base = weights(("bias", -1000L), ("stop_x1000", 10L),
      ("mean_wordlen_x100", 0L), ("punct_x1000", -10L),
      ("n_tokens", 0L))
    assert(verdicts(base) == Map(1L -> 1L, 2L -> 0L))
    // flip the signs: the SAME plan now prefers the noisy doc
    val flipped = weights(("bias", -1000L), ("stop_x1000", -10L),
      ("mean_wordlen_x100", 0L), ("punct_x1000", 10L),
      ("n_tokens", 0L))
    assert(verdicts(flipped) == Map(1L -> 0L, 2L -> 1L))
  }

  test("exact integer dot product: hand-computed score") {
    // doc 1: 13 tokens, 6 stopwords (the x3, is x2, in x2 = 7? count:
    // the,cat,is,in,the,hat,and,the,dog,is,in,the,yard -> the x4,
    // is x2, in x2, and x1 = 9 stopword hits), 0 punct,
    // n_nonspace = 36, so stop_x1000 = floor(9000/13) = 692,
    // mean_wordlen_x100 = floor(3600/13) = 276, punct_x1000 = 0
    val w = weights(("bias", 7L), ("stop_x1000", 2L),
      ("mean_wordlen_x100", 3L), ("punct_x1000", 5L),
      ("n_tokens", 11L))
    val row = LlmQueries.qualityScoreOf(docsDf, w)
      .filter(col("doc_id") === 1L).head
    assert(row.getLong(1) == 7L + 2L * 692 + 3L * 276 + 0L + 11L * 13)
  }

  test("the stored default-weight artifact drives llm_quality_score " +
    "and splits the fixture corpus") {
    val got = LlmQueries.queries("llm_quality_score")(spark,
      "/root/testdata/sf0.001").collect()
    val kept = got.count(_.getLong(2) == 1L)
    assert(kept > 0 && kept < got.length,
      s"degenerate verdict split: $kept/${got.length}")
  }
}
