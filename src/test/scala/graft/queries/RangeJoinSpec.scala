package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The bucketed range join must (a) equal the naive inequality join
  * row-for-row and (b) never plan a nested loop — the whole point of
  * bucketing is turning the range predicate into an equi-join that
  * shuffle-partitions at scale. */
class RangeJoinSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed range join equals the naive inequality join") {
    val spark = TestSpark.spark
    val out = RelationalQueries.rangeJoinBucketed(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(out.nonEmpty, "no incident windows at this scale factor")

    // naive reference: same windows, pure range predicate
    val e = Tables(spark, dir, "events")
      .select(unix_timestamp(col("ts")).as("sec"), col("event_type"))
    val wins = RelationalQueries.rangeJoinWindows(e)
    val naive = e.join(wins,
        col("sec") >= col("win_lo") && col("sec") < col("win_hi"))
      .groupBy(col("hb"), col("win_lo"), col("win_hi"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n_err"))
      .select((col("hb") * 3600).as("hour_ts"), col("win_lo"),
        col("win_hi"), col("n_events"), col("n_err"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(out == naive)
  }

  test("bucketed plan has no nested loop even with broadcast disabled") {
    val spark = TestSpark.spark
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val adaptiveBcast = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(bcast)
    val prevAdaptive = spark.conf.getOption(adaptiveBcast)
    try {
      spark.conf.set(bcast, "-1")
      spark.conf.set(adaptiveBcast, "-1")
      val df = RelationalQueries.rangeJoinBucketed(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
      // the range predicate itself must ride an equi-join on the
      // bucket key; the only tolerated nested loop is the 1-row
      // scalar-threshold cross join (condition on ne/thr, never on
      // the event timestamp)
      val smj = plan.linesIterator.filter(l =>
        l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
      assert(smj.exists(l => l.contains("[wb") && l.contains("win_lo")),
        plan)
      val bnlj = plan.linesIterator
        .filter(_.contains("BroadcastNestedLoopJoin")).toSeq
      assert(bnlj.forall(l => !l.contains("sec#") && !l.contains("win_lo")),
        plan)
    } finally {
      def restore(key: String, v: Option[String]): Unit = v match {
        case Some(x) => spark.conf.set(key, x)
        case None => spark.conf.unset(key)
      }
      restore(bcast, prev)
      restore(adaptiveBcast, prevAdaptive)
    }
  }
}
