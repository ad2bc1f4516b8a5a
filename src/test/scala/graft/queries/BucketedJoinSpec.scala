package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The 100 TB co-location story, executed: bucket `orders` and
  * `lineitem` by order key into the same bucket count and the
  * orderkey join runs with ZERO shuffle exchanges — the join the
  * rel_q03 scale notes call for at real scale. Verified on the real
  * sf0.001 parquet, against both the plan (no Exchange) and the
  * unbucketed result (identical rows). */
class BucketedJoinSpec extends AnyFunSuite {

  test("bucketed orderkey join runs without a shuffle exchange") {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a non-broadcast join so bucketing (not a broadcast) is
    // what removes the exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables(spark, dir, "orders")
        .write.mode("overwrite").bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_b")
      Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
        .write.mode("overwrite").bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), Exact.moneySum(col("l_quantity"))
          .as("sum_qty"))
      val rows = joined.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

      // final adaptive plan only (the toString also echoes the
      // pre-AQE initial plan): join + partial agg co-located in the
      // bucket layout; the ONLY exchange allowed is the 5-group
      // final-aggregation one
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(plan).length
      assert(exchanges == 1, s"expected only the final-agg exchange:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"), plan)

      val unbucketed = Tables(spark, dir, "lineitem")
        .join(Tables(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), Exact.moneySum(col("l_quantity"))
          .as("sum_qty"))
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == unbucketed && rows.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
