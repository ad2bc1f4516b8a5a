package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The BPE training loop ([[LlmQueries.bpeVocab]] /
  * [[LlmQueries.bpeApply]]) against a hand-computed corpus:
  * occurrence weighting, (n DESC, lhs, rhs) tie-breaking, greedy
  * LEFT-TO-RIGHT non-overlapping merge application (the "aaa" case
  * — one merge, not two), early stop when no pairs remain. */
class BpeTrainSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  private def corpusDir(text: String): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    Seq((1L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("hand-computed merges: weights, ties, greedy fold, early stop") {
    // words: aaab x2, aab x1
    // r1: (a,a)=5 beats (a,b)=3            -> aa
    //     greedy: aaab=[aa,a,b] (NOT [aa,aa...]), aab=[aa,b]
    // r2: (a,b)=2 ties (aa,a)=2, lex lhs   -> ab
    // r3: (aa,ab)=2 beats (aa,b)=1         -> aaab
    // r4: (aa,b)=1                          -> aab
    // r5: no pairs left -> stop (4 < bpeRounds merges)
    val dir = corpusDir("aaab aaab aab")
    val vocab = LlmQueries.bpeVocab(spark, dir)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(vocab.toSeq == Seq(
      (1, "a", "a", "aa", 5L),
      (2, "a", "b", "ab", 2L),
      (3, "aa", "ab", "aaab", 2L),
      (4, "aa", "b", "aab", 1L)))
    val applied = LlmQueries.bpeApply(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(applied == Set(("aaab", 2L, 1L), ("aab", 1L, 1L)))
  }

  test("a run of four merges pairwise, left to right: aaaa -> " +
    "[aa][aa], never [a][aa][a]") {
    val dir = corpusDir("aaaa xy")
    // r1: (a,a)=3 -> aa; aaaa folds to [aa, aa]
    val vocab = LlmQueries.bpeVocab(spark, dir)
      .orderBy("merge_rank").collect()
    assert((vocab(0).getString(1), vocab(0).getString(2),
      vocab(0).getLong(4)) == (("a", "a", 3L)))
    // r2 counts (aa,aa)=1 and (x,y)=1 — lex tie-break: (aa,aa) wins
    assert((vocab(1).getString(1), vocab(1).getString(2)) ==
      (("aa", "aa")))
    val applied = LlmQueries.bpeApply(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(applied("aaaa") == 1L && applied("xy") == 1L)
  }

  test("kernel == fold: the codegen bpe_apply kernel agrees with " +
    "the retained HOF-fold oracle on adversarial words, including " +
    "merged-symbol-reopens-as-lhs chains and non-BMP code points") {
    import spark.implicits._
    // merges chosen so merged symbols feed later merges as lhs AND
    // rhs, plus a same-symbol pair (the aaa case) and a multi-byte
    // code point (🎵 is outside the BMP: code-point splitting, not
    // UTF-16 units)
    val merges = Seq(("a", "a"), ("aa", "b"), ("aab", "a"),
      ("c", "c"), ("x", "🎵"))
    // no empty word: every caller filters word != '' first, and on
    // "" the FOLD is the quirky one — its sequence(1, length(w))
    // DESCENDS for length 0 ([1, 0]), yielding two empty tokens,
    // while the kernel returns the honest empty array
    val words = Seq("aaab", "aaaa", "aabaaab", "aabab", "abc",
      "cccc", "ccccc", "x🎵x🎵🎵", "🎵", "b", "aab",
      "aabaabaab", "zaaabz").zipWithIndex
      .map { case (w, i) => (w, i.toLong + 1) }
    val wc = words.toDF("word", "c")
    val kernel = LlmQueries.bpeApplyMerges(wc, merges)
      .select("word", "toks").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val fold = LlmQueries.bpeApplyMergesFold(wc, merges)
      .select("word", "toks").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(kernel == fold)
    // a couple of hand-pins so both implementations being wrong the
    // same way can't slip through
    // (a,a) gives [aa, a, b]; (aa,b) then finds no adjacent (aa, b)
    // pair — the merged-symbol scan, not a substring rewrite
    assert(kernel("aaab") == Seq("aa", "a", "b"))
    assert(kernel("cccc") == Seq("cc", "cc"))
    assert(kernel("ccccc") == Seq("cc", "cc", "c"))
    assert(kernel("x🎵x🎵🎵") == Seq("x🎵", "x🎵", "🎵"))
  }
}
