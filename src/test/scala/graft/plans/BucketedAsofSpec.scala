package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The as-of operator's 100 TB story, executed: [[AsofJoinExec]]
  * declares `ClusteredDistribution` on each side's key, so when both
  * inputs are ALREADY bucketed by that key EnsureRequirements reuses
  * the storage layout and plans ZERO shuffle exchanges — the same
  * proof BucketedJoinSpec gives for the equi-join path. (Sorts are
  * allowed: bucket files written from parallel tasks don't advertise
  * a per-bucket total order, so a partition-local sort remains; a
  * sort is CPU, an exchange is the network.) */
class BucketedAsofSpec extends AnyFunSuite {

  test("bucketed-by-user_id as-of join plans zero exchanges") {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    try {
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_us"))
        .write.mode("overwrite").bucketBy(4, "user_id")
        .sortBy("user_id", "ts_us").saveAsTable("purch_b")
      ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_us").as("click_us"))
        .agg(max(col("event_id")).as("click_id"))
        .write.mode("overwrite").bucketBy(4, "user_id")
        .sortBy("user_id", "click_us").saveAsTable("click_b")

      // (positional rename: the raw as-of output carries both sides'
      // user_id columns)
      def dedupCols(df: org.apache.spark.sql.DataFrame) =
        df.toDF("user_id", "event_id", "ts_us", "u2", "click_us",
          "click_id").drop("u2")

      val joined = AsofJoinOps.asof(
        spark.table("purch_b"), spark.table("click_b"),
        "user_id", "ts_us", "click_us")
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("AsofJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"expected the bucket layout to satisfy both sides:\n$plan")

      // identical rows to the unbucketed run (which IS allowed its
      // two exchanges)
      def rowSet(df: org.apache.spark.sql.DataFrame) =
        dedupCols(df)
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("click_id"), col("click_us"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) -1L else r.getLong(3),
            if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
      val bucketed = rowSet(joined)
      val plain = rowSet(AsofJoinOps.asof(
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts_us")),
        ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts_us").as("click_us"))
          .agg(max(col("event_id")).as("click_id")),
        "user_id", "ts_us", "click_us"))
      assert(bucketed == plain && bucketed.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS purch_b")
      spark.sql("DROP TABLE IF EXISTS click_b")
    }
  }
}
