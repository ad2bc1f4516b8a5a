package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming sessionizer must emit exactly the sessions the batch
  * rel_q11 window formulation computes, once the watermark has closed
  * them — real events parquet, multiple micro-batches, event-time
  * timeouts. */
class SessionStreamSpec extends AnyFunSuite {

  test("streamed sessions over real events equal the batch rel_q11") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"

    val batch = graft.queries.RelationalQueries.sessions(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSet

    val rows = graft.Tables.events(spark, dir)
      .selectExpr("user_id", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
      .sortBy(_._2.getTime)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val q = SessionStream.sessionize(
        input.toDF.toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode("append").start()
    try {
      // 4 time-ordered micro-batches, then two far-future sentinel
      // batches: the first advances the watermark past every real
      // session's timeout, the second triggers the timeout sweep.
      val chunks = rows.grouped((rows.length + 3) / 4).toSeq
      chunks.foreach { c => input.addData(c.toIndexedSeq); q.processAllAvailable() }
      val far = new Timestamp(rows.last._2.getTime + 100L * 24 * 3600 * 1000)
      input.addData((-1L, far, 0.0)); q.processAllAvailable()
      input.addData((-1L, new Timestamp(far.getTime + 1000), 0.0))
      q.processAllAvailable()

      val streamed = spark.table("sessions_test")
        .filter("user_id >= 0")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
      assert(streamed == batch)
      assert(streamed.size > 100) // non-vacuous: many multi-user sessions
    } finally q.stop()
  }

  test("a within-watermark late event never moves the session end back") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def tsMs(ms: Long) = new Timestamp(t0 + ms)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val q = SessionStream.sessionize(
        input.toDF.toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("sessions_late_test")
      .outputMode("append").start()
    try {
      input.addData((3L, tsMs(0), 1.0), (3L, tsMs(30000), 2.0))
      q.processAllAvailable()
      // rows older than the watermark are filtered before the state
      // function, so real out-of-orderness is bounded by the 1 s
      // watermark delay: this event is within that window (watermark
      // is 29 s here) yet BEFORE the open session's end at 30 s
      input.addData((3L, tsMs(29500), 4.0))
      q.processAllAvailable()
      // far-future sentinels close the session via timeout
      input.addData((-1L, tsMs(86400L * 1000 * 200), 0.0))
      q.processAllAvailable()
      input.addData((-1L, tsMs(86400L * 1000 * 200 + 1000), 0.0))
      q.processAllAvailable()
      val got = spark.table("sessions_late_test").filter("user_id >= 0")
        .collect()
        .map(r => (r.getLong(2), r.getLong(5), r.getDouble(6))).toSeq
      // 3 events, 30-second span (end NOT dragged back to 29.5 s),
      // all three values summed
      assert(got == Seq((3L, 30000000L, 7.0)))
    } finally q.stop()
  }

  test("a gap inside one micro-batch splits the session") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def ts(h: Long) = new Timestamp(t0 + h * 3600 * 1000)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val q = SessionStream.sessionize(
        input.toDF.toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("sessions_gap_test")
      .outputMode("append").start()
    try {
      // one batch: 2 events 1h apart, then a 13h gap (> 12h) -> the
      // first session closes mid-batch without any timeout needed
      input.addData((7L, ts(0), 1.0), (7L, ts(1), 2.0), (7L, ts(14), 4.0))
      q.processAllAvailable()
      val got = spark.table("sessions_gap_test").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(6))).toSeq
      assert(got == Seq((1L, 2L, 3.0))) // seq 1, 2 events, 1.0+2.0
    } finally q.stop()
  }
}
