package graft.queries

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The decayed activity score ([[RelationalQueries.decayScore]]):
  * weights must ride HOUR DISTANCE — a silent hour decays the score
  * (the row-frame window bug this operator exists to avoid) — and
  * the 8-term truncation must drop hour −8. */
class DecaySpec extends AnyFunSuite {

  private val s = TestSpark.spark
  import s.implicits._

  private def ts(h: Int) =
    Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")

  test("gap decays; adjacent hours weight 2^7 and 2^6; hour -8 " +
    "truncates") {
    // user 1: activity at hours 0 (x=1.00) and 2 (x=2.00) — the
    // hour-1 gap means hour 2 sees 1.00 at weight 2^5, NOT 2^6
    // user 2: activity at hours 0 (x=4.00) and 8 — 8 hops away,
    // outside the window entirely
    val ev = Seq(
      (1L, ts(0), 1.0), (1L, ts(2), 2.0),
      (2L, ts(0), 4.0), (2L, ts(8), 8.0))
      .toDF("user_id", "ts", "value")
      .withColumn("event_id", org.apache.spark.sql.functions
        .monotonically_increasing_id())
      .withColumn("event_type", org.apache.spark.sql.functions.lit("x"))
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("decay").toString
    ev.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = RelationalQueries.decayScore(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    // hour 0 rows: self-only → x * 128
    // user 1 hour 2: 200*128 + 100*32 = 28800 (gap → 2^5, not 2^6)
    // user 2 hour 8: self only — hour 0 is 8 hops back, truncated
    assert(got == Set(
      (1L, 100L, 12800L), (1L, 200L, 28800L),
      (2L, 400L, 51200L), (2L, 800L, 102400L)))
  }

  test("plan is the covering-hour equi-join, not a user-only join " +
    "with a residual band") {
    // the scale pin: the self-join must key on (user_id, hour_ts) —
    // a user-only join enumerates hours² pairs per user before the
    // band filter, quadratic in history length at 100 TB
    val df = RelationalQueries.decayScore(s, "/root/testdata/sf0.001")
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty, "decayScore lost its join entirely")
    joins.foreach { j =>
      val cond = j.condition.map(_.sql).getOrElse("")
      assert(cond.toLowerCase.contains("hour_ts"),
        s"join no longer keys on the hour: $cond")
      assert(!cond.contains("<=") && !cond.contains(">="),
        s"residual range predicate returned to the join: $cond")
    }
  }
}
