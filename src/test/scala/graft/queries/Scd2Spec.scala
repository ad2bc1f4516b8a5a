package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SCD2 historization semantics on hand-built event streams: run
  * collapse, version numbering, interval closure at the NEXT run's
  * start (not the current run's end), tie determinism, and the open
  * current interval. */
class Scd2Spec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def run(rows: Seq[(Long, Long, String, Long)])
      : Seq[(Long, Long, String, Long, Long, Option[Long], Boolean)] = {
    val s = spark
    import s.implicits._
    RelationalQueries.scd2Of(
        rows.toDF("user_id", "event_id", "event_type", "ts_us"))
      .select("user_id", "version", "event_type", "valid_from_us",
        "n_events", "valid_to_us", "is_current")
      .as[(Long, Long, String, Long, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
  }

  test("runs collapse; intervals close at the next run's start") {
    val out = run(Seq(
      (1L, 1L, "free", 100L), (1L, 2L, "free", 200L),
      (1L, 3L, "paid", 500L), (1L, 4L, "free", 900L)))
    assert(out === Seq(
      (1L, 1L, "free", 100L, 2L, Some(500L), false),
      (1L, 2L, "paid", 500L, 1L, Some(900L), false),
      (1L, 3L, "free", 900L, 1L, None, true)))
  }

  test("timestamp ties order by event_id — versions cannot flap") {
    val out = run(Seq(
      (1L, 2L, "b", 100L), (1L, 1L, "a", 100L)))
    assert(out === Seq(
      (1L, 1L, "a", 100L, 1L, Some(100L), false),
      (1L, 2L, "b", 100L, 1L, None, true)))
  }

  test("single-run user is one open current version; users isolate") {
    val out = run(Seq(
      (1L, 1L, "x", 10L), (1L, 2L, "x", 20L), (2L, 3L, "y", 5L)))
    assert(out === Seq(
      (1L, 1L, "x", 10L, 2L, None, true),
      (2L, 1L, "y", 5L, 1L, None, true)))
  }
}
