package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The bounded-heap top-k aggregate must produce exactly what the
  * window-rank formulation produces (score desc, ascending-id
  * tie-break), independent of partitioning — partial heaps merge
  * across partitions. */
class TopKByLongSpec extends AnyFunSuite {

  private def windowTopK(
      df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("id"))
    df.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("g"), col("id"), col("rank"), col("score"))
  }

  private def heapTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(TopKByLong.topK(col("score"), col("id"), k).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("p0", "x")))
      .select(col("g"), col("x.id").as("id"),
        (col("p0") + 1).cast("int").as("rank"), col("x.score").as("score"))

  test("matches window rank incl. ties, across many partitions") {
    val s = TestSpark.spark
    import s.implicits._
    // deterministic pseudo-random scores with deliberate collisions
    // (% 97 gives ~10 ties per group at 1000 rows)
    val rows = for (g <- 0L to 2L; i <- 0L until 1000L)
      yield (g, i, (i * 7919 + g * 104729) % 97)
    val df = rows.toDF("g", "id", "score").repartition(13)
    val expected = windowTopK(df, 10).collect().toSet
    val got = heapTopK(df, 10).collect().toSet
    assert(got == expected)
    assert(got.size == 30)
  }

  test("matches window rank with negative scores (real dot products)") {
    val s = TestSpark.spark
    import s.implicits._
    val rows = for (g <- 0L to 1L; i <- 0L until 500L)
      yield (g, i, (i * 6151 + g * 31) % 101 - 50) // scores in [-50, 50]
    val df = rows.toDF("g", "id", "score").repartition(7)
    assert(heapTopK(df, 7).collect().toSet ==
      windowTopK(df, 7).collect().toSet)
  }

  test("k larger than the group emits the whole group, sorted") {
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq((1L, 10L, 5L), (1L, 11L, 9L), (1L, 12L, 5L))
      .toDF("g", "id", "score")
    val got = heapTopK(df, 100).collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3))).toSeq
    assert(got == Seq((11L, 1, 9L), (10L, 2, 5L), (12L, 3, 5L)))
  }

  test("null scores and ids are skipped") {
    val s = TestSpark.spark
    val df = s.sql(
      """SELECT * FROM VALUES (1L, 1L, 5L), (1L, 2L, CAST(NULL AS BIGINT)),
        |  (1L, CAST(NULL AS BIGINT), 7L) AS t(g, id, score)""".stripMargin)
    val got = heapTopK(df, 10).collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L))
  }

  test("reachable from SQL as top_k_l") {
    val r = TestSpark.spark.sql(
      """SELECT top_k_l(score, id, 2) AS tk FROM VALUES
        |  (1L, 10L), (3L, 20L), (2L, 30L) AS t(score, id)""".stripMargin)
      .selectExpr("transform(tk, x -> x.id) AS ids").collect().head
    assert(r.getSeq[Long](0) == Seq(20L, 30L))
  }
}
