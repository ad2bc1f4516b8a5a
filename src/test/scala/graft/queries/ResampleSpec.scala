package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The hourly LOCF resample on hand-built gap patterns: carried
  * values across multi-hour gaps, per-user isolation (no carry
  * across users), per-hour observation tie-break, and the
  * longest-run bookkeeping. */
class ResampleSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def run(rows: Seq[(Long, Long, Long)])
      : Map[Long, (Long, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    RelationalQueries.resampleOf(
        rows.toDF("user_id", "event_id", "hour"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
  }

  test("gap hours carry the latest prior observation; runs counted") {
    // user 1: active h10 (obs 5), gaps h11-h13, active h14 (obs 9),
    // gap h15? no — grid ends at last active hour (h14)
    val out = run(Seq((1L, 5L, 10L), (1L, 9L, 14L)))
    // n_hours=5, n_gap=3, sum_events=2, carried over gaps = 5*3,
    // longest_gap=3
    assert(out(1L) === ((5L, 3L, 2L, 15L, 3L)))
  }

  test("no carry across users; single-hour users have no gaps") {
    val out = run(Seq((1L, 100L, 10L), (1L, 1L, 12L), (2L, 7L, 11L)))
    assert(out(1L) === ((3L, 1L, 2L, 100L, 1L)))
    assert(out(2L) === ((1L, 0L, 1L, 0L, 0L)))
  }

  test("per-hour observation is the max event_id of that hour") {
    // h10 has events 3 and 8 -> obs 8 carried into the gap
    val out = run(Seq((1L, 3L, 10L), (1L, 8L, 10L), (1L, 2L, 12L)))
    assert(out(1L) === ((3L, 1L, 3L, 8L, 1L)))
  }

  test("two separated gap runs: longest wins, both sum carried") {
    // active h1(obs 4), gaps h2-h3, active h4(obs 6), gap h5,
    // active h6(obs 1)
    val out = run(Seq((1L, 4L, 1L), (1L, 6L, 4L), (1L, 1L, 6L)))
    assert(out(1L) === ((6L, 3L, 3L, 4L + 4L + 6L, 2L)))
  }
}
