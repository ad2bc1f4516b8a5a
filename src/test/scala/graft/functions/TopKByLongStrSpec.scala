package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The string-labelled bounded-heap top-k must equal the window-rank
  * formulation (score desc, binary-ascending label tie-break)
  * regardless of partitioning, and must own its retained strings
  * (UnsafeRow-backed UTF8Strings are reused buffers — a missing clone
  * shows up as corrupted labels exactly in multi-row-per-partition
  * runs like these). */
class TopKByLongStrSpec extends AnyFunSuite {

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("id"))
    df.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("g"), col("id"), col("rank"), col("score"))
  }

  private def heapTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(TopKByLongStr.topKStr(col("score"), col("id"), k).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("p0", "x")))
      .select(col("g"), col("x.id").as("id"),
        (col("p0") + 1).cast("int").as("rank"), col("x.score").as("score"))

  test("matches window rank incl. score ties, across many partitions") {
    val s = TestSpark.spark
    import s.implicits._
    // colliding scores (% 41) force the binary tie-break; varied-length
    // labels exercise the serialize/clone paths
    val rows = for (g <- 0L to 2L; i <- 0L until 800L)
      yield (g, s"term-${(i * 7919 + g) % 300}-${"x" * (i % 5).toInt}",
        (i * 6151 + g * 13) % 41)
    val df = rows.toDF("g", "id", "score").repartition(13)
    val expected = windowTopK(df, 5).collect().toSet
    val got = heapTopK(df, 5).collect().toSet
    assert(got == expected)
    assert(got.size == 15)
  }

  test("retained labels survive buffer reuse (unsafe-row clone)") {
    val s = TestSpark.spark
    import s.implicits._
    // single partition, many rows through one reused scan buffer:
    // without the clone the final heap would hold k copies of the
    // LAST row's bytes
    val rows = (0L until 500L).map(i => (1L, f"label$i%04d", i))
    val df = rows.toDF("g", "id", "score").coalesce(1)
    val got = heapTopK(df, 3).collect()
      .map(r => (r.getString(1), r.getLong(3))).toSeq
    assert(got == Seq(("label0499", 499L), ("label0498", 498L),
      ("label0497", 497L)))
  }

  test("k larger than the group emits the whole group, sorted") {
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq((1L, "b", 5L), (1L, "c", 9L), (1L, "a", 5L))
      .toDF("g", "id", "score")
    val got = heapTopK(df, 100).collect()
      .map(r => (r.getString(1), r.getInt(2), r.getLong(3))).toSeq
    assert(got == Seq(("c", 1, 9L), ("a", 2, 5L), ("b", 3, 5L)))
  }

  test("null scores and labels are skipped") {
    val s = TestSpark.spark
    val df = s.sql(
      """SELECT * FROM VALUES (1L, 'a', 5L),
        |  (1L, 'b', CAST(NULL AS BIGINT)),
        |  (1L, CAST(NULL AS STRING), 7L) AS t(g, id, score)""".stripMargin)
    val got = heapTopK(df, 10).collect()
    assert(got.map(_.getString(1)).toSeq == Seq("a"))
  }

  test("reachable from SQL as top_k_ls") {
    val r = TestSpark.spark.sql(
      """SELECT top_k_ls(score, id, 2) AS tk FROM VALUES
        |  (1L, 'x'), (3L, 'y'), (2L, 'z') AS t(score, id)""".stripMargin)
      .selectExpr("transform(tk, x -> x.id) AS ids").collect().head
    assert(r.getSeq[String](0) == Seq("y", "z"))
  }
}
