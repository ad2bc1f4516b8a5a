package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** The unigram Viterbi DP ([[LlmQueries.viterbiWord]]) pinned
  * against brute-force enumeration of every segmentation — the DP
  * must realize the global (token count, −freqsum,
  * longer-final-token) optimum, not a greedy approximation — plus
  * the hand cases that separate unigram from WordPiece's greedy
  * longest-match. */
class UnigramSpec extends AnyFunSuite {

  /** Every segmentation of `w` over `v`, brute force. */
  private def allSegs(w: String,
      v: Map[String, Long]): Seq[List[String]] =
    if (w.isEmpty) Seq(Nil)
    else (1 to math.min(4, w.length)).flatMap { l =>
      val h = w.substring(0, l)
      if (v.contains(h)) allSegs(w.substring(l), v).map(h :: _)
      else Nil
    }

  /** The canonical optimum by exhaustive search: min (k, −freqsum,
    * reversed-length key preferring longer tokens). */
  private def bruteBest(w: String,
      v: Map[String, Long]): List[String] =
    allSegs(w, v).minBy { seg =>
      val key = seg.reverse.map(t => ('0' + (4 - t.length)).toChar)
        .mkString
      (seg.length, -seg.map(v).sum, key)
    }

  test("unigram beats greedy: the global split wins") {
    // greedy longest-match takes ab|c (freq 5+1); the DP finds a|bc
    // (freq 3+9) at the same token count
    val v = Map("ab" -> 5L, "bc" -> 9L, "a" -> 3L, "b" -> 2L,
      "c" -> 1L)
    assert(LlmQueries.viterbiWord("abc", v) == Seq("a", "bc"))
    assert(LlmQueries.walkWord("abc", v.keySet, None) ==
      Seq("ab", "c")) // the greedy answer, for contrast
  }

  test("fewer tokens beats higher frequency sum") {
    // abcd as one token (freq 1) beats a|b|c|d (freq 400 total):
    // count dominates, frequency only breaks count ties
    val v = Map("abcd" -> 1L, "a" -> 100L, "b" -> 100L,
      "c" -> 100L, "d" -> 100L)
    assert(LlmQueries.viterbiWord("abcd", v) == Seq("abcd"))
  }

  test("full tie canonicalized by the longer FINAL token") {
    // aa|a and a|aa tie on count and frequency; the canonical
    // choice ends with the longer token
    val v = Map("aa" -> 5L, "a" -> 5L)
    assert(LlmQueries.viterbiWord("aaa", v) == Seq("a", "aa"))
  }

  test("unsegmentable word fails loudly") {
    assertThrows[IllegalArgumentException](
      LlmQueries.viterbiWord("xyz", Map("a" -> 1L)))
  }

  /** Brute force over the frozen-vocab edge set: vocabulary edges
    * plus a frequency-0 length-1 `<UNK>` edge at positions where no
    * entry matches. */
  private def allSegsUnk(w: String, v: Map[String, Long],
      full: String): Seq[List[(String, Long, Int)]] = {
    if (w.isEmpty) return Seq(Nil)
    val p = full.length - w.length
    val vocabEdges = (1 to math.min(4, w.length)).flatMap { l =>
      val h = w.substring(0, l)
      v.get(h).toSeq.flatMap(f =>
        allSegsUnk(w.substring(l), v, full).map((h, f, l) :: _))
    }
    if (vocabEdges.nonEmpty ||
      (1 to math.min(4, w.length)).exists(l =>
        v.contains(w.substring(0, l)))) vocabEdges
    else allSegsUnk(w.substring(1), v, full)
      .map(("<UNK>", 0L, 1) :: _)
  }

  private def bruteBestUnk(w: String,
      v: Map[String, Long]): List[String] =
    allSegsUnk(w, v, w).minBy { seg =>
      val key = seg.reverse.map { case (_, _, l) =>
        ('0' + (4 - l)).toChar }.mkString
      (seg.length, -seg.map(_._2).sum, key)
    }.map(_._1)

  test("frozen vocab: unmatchable positions emit <UNK>, matchable " +
    "ones never do") {
    val v = Map("ab" -> 5L, "a" -> 3L, "b" -> 2L)
    assert(LlmQueries.viterbiWordUnk("axb", v) ==
      Seq("a", "<UNK>", "b"))
    assert(LlmQueries.viterbiWordUnk("ab", v) == Seq("ab"))
    assert(LlmQueries.viterbiWordUnk("xx", v) ==
      Seq("<UNK>", "<UNK>"))
  }

  test("UNK DP equals brute-force enumeration over 2000 random " +
    "cases with holes") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcx" // x never enters the vocab: a real hole
    for (_ <- 0 until 2000) {
      val wLen = 1 + rnd.nextInt(9)
      val w = Seq.fill(wLen)(alphabet(rnd.nextInt(4))).mkString
      val grams = Seq.fill(5) {
        val l = 2 + rnd.nextInt(3)
        Seq.fill(l)("abc"(rnd.nextInt(3))).mkString
      }
      val v = ("abc".map(_.toString) ++ grams).distinct
        .map(g => g -> (1L + rnd.nextInt(20))).toMap
      assert(LlmQueries.viterbiWordUnk(w, v) == bruteBestUnk(w, v),
        s"w=$w v=$v")
    }
  }

  test("DP equals brute-force enumeration over 3000 random cases") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    for (_ <- 0 until 3000) {
      val wLen = 1 + rnd.nextInt(10)
      val w = Seq.fill(wLen)(alphabet(rnd.nextInt(3))).mkString
      // vocab: all chars (progress guarantee) + random grams
      val grams = Seq.fill(6) {
        val l = 2 + rnd.nextInt(3)
        Seq.fill(l)(alphabet(rnd.nextInt(3))).mkString
      }
      val v = (alphabet.map(_.toString) ++ grams).distinct
        .map(g => g -> (1L + rnd.nextInt(20))).toMap
      assert(LlmQueries.viterbiWord(w, v) == bruteBest(w, v),
        s"w=$w v=$v")
    }
  }
}
