package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class SaltedAggSpec extends AnyFunSuite {

  test("salted aggregation equals direct groupBy on skewed data") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 90% of rows share one hot key — the shape that stalls a reducer
    val rows = (1 to 2000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 7}" else "hot"
      (k, (i % 13).toLong)
    }
    val df = rows.toDF("k", "v")
    val direct = df.groupBy($"k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val salted = SaltedAgg.saltedSumCount(df, $"k", $"v", salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(salted == direct)
  }
}
