package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** AQE-skew COMPOSITION audit: the engine's manual skew knobs
  * (sharded sessionization, the salted range join, the LSH bucket
  * cap) must compose with `spark.sql.adaptive.skewJoin.enabled=true`
  * — results identical in every cell of the {manual knob} × {AQE
  * skew handling} matrix, with AQE forced aggressive (factor 1,
  * 16 KB threshold, forceOptimizeSkewedJoin) so it genuinely fires
  * at test scale rather than sitting inert behind the 256 MB
  * default.
  *
  * Which wins where (the documented division of labor):
  *  - SESSIONS: AQE skew-join splits JOINS only — a skewed WINDOW
  *    partition (one bot user's events on one reducer) is invisible
  *    to it, so the chunk knob is the only lever; AQE composes as a
  *    no-op.
  *  - RANGE JOIN: both apply — AQE can split a hot bucket's
  *    SMJ/SHJ partition at runtime; the salt spreads it at plan
  *    time. They compose because the salt is part of the join KEY
  *    (AQE sees an ordinary equi-join on (key, salt)).
  *  - LSH CAP: the guarded stage is an AGGREGATION
  *    (collect_list per bucket), not a join — AQE skew handling
  *    never splits aggregation groups, so the md5-rank salt is the
  *    only protection against a degenerate bucket materializing
  *    whole in one aggregation row; AQE composes as a no-op.
  */
class AqeSkewComposeSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val dayUs = 24L * 3600 * 1000000

  /** Run `f` with AQE skew handling forced ON aggressively, or
    * explicitly OFF; always restores prior session state. */
  private def withAqeSkew[T](on: Boolean)(f: => T): T = {
    val s = spark
    val settings: Seq[(String, String)] =
      if (on) Seq(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
          -> "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB")
      else Seq("spark.sql.adaptive.skewJoin.enabled" -> "false")
    val prev = settings.map { case (k, _) => k -> s.conf.getOption(k) }
    try { settings.foreach { case (k, v) => s.conf.set(k, v) }; f }
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("range join: {salts 1, 8} x {AQE skew off, forced} — all four " +
    "cells identical on the thundering-herd corpus") {
    val s = spark
    import s.implicits._
    val herd = ((0 until 4000).map(i =>
      (i.toLong % 3600, if (i % 2 == 0) "error" else "click")) ++
      (1 to 20).map(h => (h * 3600L + 7, "error")))
      .toDF("sec", "event_type")
    val cells = for {
      salts <- Seq(1, 8)
      aqe <- Seq(false, true)
    } yield ((salts, aqe), withAqeSkew(aqe)(
      rows(RelationalQueries.rangeJoinBucketedOf(herd, salts))))
    val base = cells.head._2
    assert(base.nonEmpty)
    cells.foreach { case (cell, got) =>
      assert(got == base, s"cell $cell diverged")
    }
  }

  test("sessions: AQE skew handling is a no-op on the skewed WINDOW " +
    "(not a join) — sharded and single-pass agree under it") {
    val s = spark
    import s.implicits._
    val minuteUs = 60L * 1000000
    val bots = ((0 until 4000).map(i =>
      (0L, new Timestamp(i * minuteUs / 1000), 1.0)) ++
      (1 to 9).flatMap(u => (0 until 5).map(i =>
        (u.toLong, new Timestamp((i * 30 * dayUs / 1000) + u * 1000),
          2.5)))).toDF("user_id", "ts", "value")
    val base = withAqeSkew(false)(rows(RelationalQueries.sessionsOf(bots)))
    assert(base.nonEmpty)
    withAqeSkew(true) {
      assert(rows(RelationalQueries.sessionsOf(bots)) == base)
      assert(rows(RelationalQueries.sessionsSharded(bots, dayUs)) == base)
    }
  }

  test("LSH cap: the degenerate-bucket salt is aggregation-side " +
    "(outside AQE skew-join's reach) and deterministic under it") {
    val s = spark
    import s.implicits._
    // degenerate band hash: 200 docs share one (band, bv) — far past
    // the 64 cap — next to one healthy bucket
    val b = ((1L to 200L).map(d => (1, "DEGEN", d)) ++
      Seq((2, "OK", 1L), (2, "OK", 2L)))
      .toDF("band", "bv", "doc_id")
    val base = withAqeSkew(false)(
      rows(graft.llm.LlmQueries.pairsFromBands(b)))
    // the cap engaged: within-salt-cell pairs only, nowhere near the
    // 200-choose-2 all-pairs expansion (plus the healthy pair)
    assert(base.contains(Seq(1L, 2L)))
    assert(base.size < 200 * 199 / 2 / 2 && base.size > 100)
    withAqeSkew(true) {
      assert(rows(graft.llm.LlmQueries.pairsFromBands(b)) == base)
    }
  }
}
