package graft.functions

import org.apache.spark.SparkException
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class VecSumLongSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("elementwise sums per group, via DataFrame API and SQL") {
    val df = Seq(
      ("a", Array(1L, 2L, 3L)),
      ("a", Array(10L, 20L, 30L)),
      ("b", Array(-7L, 0L, 7L)),
    ).toDF("g", "v")
    val got = df.groupBy("g")
      .agg(VecSumLong.vecSum($"v").as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") == Seq(11L, 22L, 33L))
    assert(got("b") == Seq(-7L, 0L, 7L))

    df.createOrReplaceTempView("vecs")
    val sqlGot = spark
      .sql("SELECT g, vec_sum_l(v) AS s FROM vecs GROUP BY g")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sqlGot == got)
  }

  test("null vectors are skipped; all-null group evaluates to NULL") {
    val df = Seq(
      ("a", Option(Array(5L, 5L))),
      ("a", Option.empty[Array[Long]]),
      ("b", Option.empty[Array[Long]]),
    ).toDF("g", "v")
    val rows = df.groupBy("g").agg(VecSumLong.vecSum($"v").as("s"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(rows("a").get.asInstanceOf[scala.collection.Seq[Long]].toSeq ==
      Seq(5L, 5L))
    assert(rows("b").isEmpty)
  }

  test("null vector ELEMENTS fail loudly instead of summing as zero") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = true))))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row("a", Seq[Any](1L, null, 3L)))
    val df = spark.createDataFrame(rows, schema)
    val e = intercept[SparkException] {
      df.groupBy("g").agg(VecSumLong.vecSum($"v")).collect()
    }
    assert(e.getMessage.contains("null vector element") ||
      Option(e.getCause).exists(_.getMessage.contains("null vector element")))
  }

  test("ragged vectors fail loudly") {
    val df = Seq(("a", Array(1L, 2L)), ("a", Array(1L, 2L, 3L)))
      .toDF("g", "v")
    val e = intercept[SparkException] {
      df.groupBy("g").agg(VecSumLong.vecSum($"v")).collect()
    }
    assert(e.getMessage.contains("length mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("length mismatch")))
  }
}
