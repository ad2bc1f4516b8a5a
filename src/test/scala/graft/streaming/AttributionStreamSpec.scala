package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The stream-stream range join must emit exactly the pairs the same
  * function computes on the batch frames — real events parquet, both
  * sides streamed in micro-batches. */
class AttributionStreamSpec extends AnyFunSuite {

  test("stream-stream attribution equals the batch range join") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"

    val ev = graft.Tables.events(spark, dir)
      .selectExpr("event_id", "user_id", "ts", "event_type")
    val batch = AttributionStream.rangeAttribution(
        ev.filter("event_type = 'purchase'"),
        ev.filter("event_type = 'click'"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet

    val rows = ev.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getString(3)))
      .sortBy(_._3.getTime)

    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[(Long, Long, Timestamp)]
    val cIn = MemoryStream[(Long, Long, Timestamp)]
    val q = AttributionStream.rangeAttribution(
        pIn.toDF.toDF("event_id", "user_id", "ts"),
        cIn.toDF.toDF("event_id", "user_id", "ts"))
      .writeStream.format("memory").queryName("attribution_test")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length + 3) / 4).foreach { chunk =>
        val p = chunk.filter(_._4 == "purchase").map(e => (e._1, e._2, e._3))
        val c = chunk.filter(_._4 == "click").map(e => (e._1, e._2, e._3))
        if (p.nonEmpty) pIn.addData(p.toIndexedSeq)
        if (c.nonEmpty) cIn.addData(c.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("attribution_test").collect()
        .map(r => (r.getLong(0), r.getLong(3))).toSet
      assert(streamed == batch)
      assert(streamed.size > 20) // non-vacuous at sf0.001 (45 pairs)
    } finally q.stop()
  }
}
