package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The integer boosted-stump trainer ([[LlmQueries.trainBoostedOf]])
  * on a fixture with a KNOWN hand-computed trace: no single stump
  * separates (best = 2 errors), but the 3-round ensemble classifies
  * perfectly — the classic interleaved-labels AdaBoost demo, here
  * with every weight/alpha an exact integer. Each round's argmin,
  * weighted error, and alpha are pinned by hand, so a reweighting or
  * tie-break bug fails on the specific round it corrupts. */
class QualityBoostedSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  /** Labels + + − − + + over n_tokens 1..6; the other three features
    * constant 0 (they can never beat the class prior). */
  private def feats = {
    import spark.implicits._
    Seq(
      (1L, "en", 1, 1L, 0L, 0L, 0L),
      (2L, "en", 1, 2L, 0L, 0L, 0L),
      (3L, "xx", 0, 3L, 0L, 0L, 0L),
      (4L, "xx", 0, 4L, 0L, 0L, 0L),
      (5L, "en", 1, 5L, 0L, 0L, 0L),
      (6L, "en", 1, 6L, 0L, 0L, 0L))
      .toDF("doc_id", "lang", "is_pos", "n_tokens", "stop_x1000",
        "mean_wordlen_x100", "punct_x1000")
  }

  test("three boosted rounds trace exactly the hand computation: " +
    "all-positive prior, x<3, x>=5, alphas 2/4/6") {
    val got = LlmQueries.trainBoostedOf(feats, 3)
      .map(st => (st.round, st.feature, st.threshold, st.polarity,
        st.wErr, st.wTotal, st.alpha))
    assert(got == Seq(
      // round 1: every feature's best is 2 errors; the (err,
      // feature, threshold, polarity) tie-break picks the
      // lexicographically least feature — the constant
      // mean_wordlen_x100 at threshold 0, 'ge' = predict ALL
      // positive (the class prior). Misclassifies docs 3, 4.
      (1, "mean_wordlen_x100", 0L, "ge", 2L, 6L, 2L),
      // round 2: docs 3, 4 doubled (total 8). "pos iff x < 3" errs
      // only on docs 5, 6 (weight 2); the x-tie-break prefers
      // threshold 3 over the equal-error threshold-5 'ge' stump.
      (2, "n_tokens", 3L, "lt", 2L, 8L, 4L),
      // round 3: docs 5, 6 doubled (total 10). "pos iff x >= 5"
      // errs only on docs 1, 2 (weight 1 each).
      (3, "n_tokens", 5L, "ge", 2L, 10L, 6L)))
  }

  test("the trained ensemble beats the best single stump: 0 errors " +
    "vs the stump floor of 2 (votes 2·prior + 4·[x<3] + 6·[x>=5]; " +
    "the zero-vote tie on docs 1, 2 resolves positive)") {
    import spark.implicits._
    val stumps = LlmQueries.trainBoostedOf(feats, 3)
    val ens = stumps.map(st => (st.feature, st.threshold,
      st.polarity, st.alpha))
      .toDF("feature", "threshold", "polarity", "alpha")
    val got = LlmQueries.boostedScoreOf(feats, ens).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // en: docs 1,2 vote 2+4−6=0 → pos; docs 5,6 vote 2−4+6=4 → pos
    assert(got("en") == ((4L, 4L, 4L)))
    // xx: docs 3,4 vote 2−4−6=−8 → neg, correct
    assert(got("xx") == ((2L, 0L, 2L)))
    val ensembleErrors = 6L - got.values.map(_._3).sum
    assert(ensembleErrors == 0L)
    // no single stump on this fixture does better than 2 errors
    val bestSingle = stumps.map(_.wErr).min
    assert(ensembleErrors < bestSingle && bestSingle == 2L)
  }

  test("non-separable data stays honest: round 1 is weighted " +
    "chance (alpha 0) and the final ensemble cannot beat chance") {
    import spark.implicits._
    // two identical feature rows with opposite labels: round 1 is
    // exact chance (alpha 0). Reweighting then SKEWS the weighted
    // distribution (the misclassified doc doubles), so round 2's
    // all-negative stump legitimately earns alpha 1 against the
    // skewed weights, and round 3 is chance again on [2, 2] —
    // but the UNWEIGHTED ensemble still classifies only 1 of 2.
    val coin = Seq(
      (1L, "en", 1, 7L, 0L, 0L, 0L),
      (2L, "xx", 0, 7L, 0L, 0L, 0L))
      .toDF("doc_id", "lang", "is_pos", "n_tokens", "stop_x1000",
        "mean_wordlen_x100", "punct_x1000")
    val stumps = LlmQueries.trainBoostedOf(coin, 3)
    assert(stumps.map(_.alpha) == Seq(0L, 1L, 0L))
    assert(stumps.head.wErr * 2 == stumps.head.wTotal)
    val ens = stumps.map(st => (st.feature, st.threshold,
      st.polarity, st.alpha))
      .toDF("feature", "threshold", "polarity", "alpha")
    val nCorrect = LlmQueries.boostedScoreOf(coin, ens).collect()
      .map(_.getLong(3)).sum
    assert(nCorrect == 1L) // chance on a 2-doc coin flip
  }
}
