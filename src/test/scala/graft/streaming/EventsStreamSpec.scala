package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming rollup must agree with its batch twin: same groups,
  * same exact-integer sums (SURVEY §7 phase 5's Structured Streaming
  * extension). */
class EventsStreamSpec extends AnyFunSuite {

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  private val rows = Seq(
    (ts(10, 5), "click", 1.25),
    (ts(10, 55), "click", 2.50),
    (ts(10, 20), "view", 0.75),
    (ts(11, 1), "click", 4.00))

  test("streaming hourly rollup matches the batch computation") {
    val spark = TestSpark.spark
    import spark.implicits._

    // batch twin (withWatermark is a no-op on batch data)
    val batch = EventsStream.hourlyRollup(
      rows.toDF("ts", "event_type", "value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = EventsStream.hourlyRollup(
        input.toDF.toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode("complete").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("hourly_test")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(streamed == batch)
      assert(streamed.size == 3) // (10h click), (10h view), (11h click)
      val tenClick = streamed.find(t => t._2 == "click" && t._3 == 2L).get
      assert(tenClick._4 == 3.75) // exact via integer-cents sum
    } finally q.stop()
  }

  test("streaming sliding rollup matches batch; each event lands in 3 windows") {
    val spark = TestSpark.spark
    import spark.implicits._

    val batch = EventsStream.slidingRollup(
      rows.toDF("ts", "event_type", "value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = EventsStream.slidingRollup(
        input.toDF.toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("sliding_test")
      .outputMode("complete").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("sliding_test")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(streamed == batch)
      // a 10h click appears in the windows starting 08,09,10; the
      // 11h click adds 09,10,11 — so "click" spans 4 window starts
      val clickStarts = streamed.filter(_._2 == "click").map(_._1)
      assert(clickStarts.size == 4)
      // the window covering both hours (starting 09h or 10h) sums all
      // three clicks exactly
      val full = streamed.find(t => t._2 == "click" && t._3 == 3L).get
      assert(full._4 == 7.75)
    } finally q.stop()
  }

  test("streaming dedup drops within-watermark replays of event_id") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val q = EventsStream.dedupEvents(
        input.toDF.toDF("event_id", "ts", "value"))
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(10, 0), 1.0), (2L, ts(10, 5), 2.0))
      q.processAllAvailable()
      // replay of event 1 in a later micro-batch, still in-watermark
      input.addData((1L, ts(10, 0), 1.0), (3L, ts(10, 10), 3.0))
      q.processAllAvailable()
      val got = spark.table("dedup_test").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("file-source streaming over real events parquet matches batch") {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val batch = EventsStream.hourlyRollup(graft.Tables.events(spark, dir))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val q = EventsStream.hourlyRollup(EventsStream.readEvents(spark, dir))
      .writeStream.format("memory").queryName("events_file_test")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val streamed = spark.table("events_file_test")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }
}
