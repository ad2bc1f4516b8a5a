package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The two documented skew knobs: sharded sessionization and the
  * salted range join must return EXACTLY the default answers on both
  * real and adversarially-skewed data, while bounding what any one
  * reducer can see of a hot key. */
class SkewKnobSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private def spark = TestSpark.spark

  private val dayUs = 24L * 3600 * 1000000

  /** A bot corpus: user 0 emits `hot` events at 1-minute spacing
    * (one giant multi-day session); users 1..9 are sparse. */
  private def botEvents(hot: Int): DataFrame = {
    val s = spark
    import s.implicits._
    val minuteUs = 60L * 1000000
    val hotRows = (0 until hot).map(i =>
      (0L, new Timestamp(i * minuteUs / 1000), 1.0))
    val coldRows = (1 to 9).flatMap(u => (0 until 5).map(i =>
      (u.toLong, new Timestamp((i * 30 * dayUs / 1000) + u * 1000), 2.5)))
    (hotRows ++ coldRows).toDF("user_id", "ts", "value")
  }

  private def sessionSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("sharded sessionization equals single-pass on the bot corpus " +
    "and on real events, for several chunk widths") {
    val s = spark
    val bots = botEvents(5000)
    val base = sessionSet(RelationalQueries.sessionsOf(bots))
    // the hot user is ONE session; a correct shard+merge must rebuild
    // it across every chunk boundary
    assert(base.count(_.head == 0L) == 1)
    for (chunk <- Seq(dayUs, 7 * dayUs, RelationalQueries.sessionGapUs + 1))
      assert(sessionSet(RelationalQueries.sessionsSharded(bots, chunk))
        == base, s"chunk $chunk diverged")

    val real = graft.Tables(s, dir, "events")
    assert(sessionSet(RelationalQueries.sessionsSharded(real, 7 * dayUs))
      == sessionSet(RelationalQueries.sessionsOf(real)))
  }

  test("phase-1 reducer input is bounded by the hot user's per-chunk " +
    "events, not their total") {
    val bots = botEvents(5000)
    // replay phase 1's partition key: (user, chunk) group sizes
    val sizes = bots
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("chunk", expr(s"ts_us div $dayUs"))
      .groupBy(col("user_id"), col("chunk")).count()
      .collect().map(_.getLong(2))
    val total = 5000L
    assert(sizes.max <= 1441, // one event/minute → ≤ a day's worth + 1
      s"a (user, chunk) cell saw ${sizes.max} of $total events")
  }

  test("rel_q11_sessions via the conf knob matches the default path") {
    val s = spark
    val default = sessionSet(RelationalQueries.queries("rel_q11_sessions")(s, dir))
    try {
      s.conf.set(RelationalQueries.sessionsChunkFlag, (7 * dayUs).toString)
      assert(sessionSet(
        RelationalQueries.queries("rel_q11_sessions")(s, dir)) == default)
    } finally s.conf.unset(RelationalQueries.sessionsChunkFlag)
  }

  test("salted range join matches the default on real data and on a " +
    "single-hot-hour corpus, and actually joins on the salt") {
    val s = spark
    import s.implicits._
    def rows(df: DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    val default = rows(RelationalQueries.queries("rel_q27_range_join")(s, dir))
    try {
      s.conf.set(RelationalQueries.rangeJoinSaltsFlag, "8")
      val salted = RelationalQueries.queries("rel_q27_range_join")(s, dir)
      assert(rows(salted) == default && default.nonEmpty)
      val plan = salted.queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), plan) // the hot key really spreads
    } finally s.conf.unset(RelationalQueries.rangeJoinSaltsFlag)

    // thundering herd: one hot hour with 2000 errors, plus 20 quiet
    // hours with one error each so the relative incident threshold
    // (1.5x the mean) fires on the hot hour only
    val herd = ((0 until 4000).map(i =>
      (i.toLong % 3600, if (i % 2 == 0) "error" else "click")) ++
      (1 to 20).map(h => (h * 3600L + 7, "error")))
      .toDF("sec", "event_type")
    assert(rows(RelationalQueries.rangeJoinBucketedOf(herd, 8)) ==
      rows(RelationalQueries.rangeJoinBucketedOf(herd, 1)))
    assert(rows(RelationalQueries.rangeJoinBucketedOf(herd, 1)).nonEmpty)
  }
}
