package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The greedy longest-match walk behind llm_wordpiece_tokens /
  * llm_wordpiece_incremental, pinned on hand-built vocabularies —
  * in particular the `<UNK>` fallback, which the synthetic corpus
  * never exercises (the base alphabet covers every arriving char
  * there), and the loud-fail contract of the full-corpus mode. */
class WordpieceSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def walk(words: Seq[(String, Long)], vocab: Set[String],
      unk: Option[String]): Seq[(String, String, Long)] = {
    val s = spark
    import s.implicits._
    val bc = s.sparkContext.broadcast(vocab)
    LlmQueries.greedyWalk(words.toDF("word", "c"), bc, unk)
      .as[(String, String, Long)].collect().toSeq
  }

  test("longest match wins at every cursor position") {
    // greedy takes 'aba' (len 3) over 'ab'/'a', leaving 'b'
    assert(walk(Seq(("abab", 2L)), Set("a", "b", "ab", "aba"),
      unk = None) ===
      Seq(("abab", "aba", 2L), ("abab", "b", 2L)))
  }

  test("unknown characters emit <UNK> and advance exactly one char") {
    // 'c' and 'x' are not in vocab: each becomes its own <UNK>,
    // and the walk resynchronizes on 'ab' after the gap
    assert(walk(Seq(("abcxab", 3L)), Set("ab", "a", "b"),
      unk = Some("<UNK>")) ===
      Seq(("abcxab", "ab", 3L), ("abcxab", "<UNK>", 3L),
        ("abcxab", "<UNK>", 3L), ("abcxab", "ab", 3L)))
  }

  test("full-corpus mode fails loudly on an uncovered character") {
    val e = intercept[org.apache.spark.SparkException] {
      walk(Seq(("ax", 1L)), Set("a"), unk = None)
    }
    assert(e.getMessage.contains("no vocab entry matches") ||
      Option(e.getCause).exists(
        _.getMessage.contains("no vocab entry matches")))
  }

  test("frozen vocabulary: arriving-only characters surface as OOV " +
      "mass end-to-end") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("wp-docs").toFile.getAbsolutePath
    // base docs (ids 1,2) define the alphabet {a..e, space side};
    // arriving doc (id 17 ≡ 7 mod 10) carries 'zq' — never seen
    Seq(
      (1L, "en", "abc abd ce"),
      (2L, "en", "ab abc de"),
      (17L, "en", "ab zq abc"))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = LlmQueries.wordpieceIncremental(s, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out("<UNK>") == 2L, s"expected 2 OOV chars, got $out")
    // and the known words still tokenize against the frozen vocab
    assert(out.keys.exists(_ != "<UNK>"))
  }
}
