package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.DotProductLong

class DotProductRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val naive =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, x) -> s + x)"

  private def hasKernel(df: DataFrame): Boolean = {
    var found = false
    df.queryExecution.optimizedPlan.transformAllExpressions {
      case e: DotProductLong => found = true; e
    }
    found
  }

  // repartition keeps the optimizer from folding the whole projection
  // into a LocalRelation (local Seq inputs are otherwise pre-computed
  // at plan time, leaving no expression tree to inspect)
  private def longArrays: DataFrame =
    Seq(
      (1L, Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
      (2L, Array(0L, -1L, 2L), Array(7L, 8L, 9L)),
    ).toDF("id", "a", "b").repartition(1)

  test("naive HOF dot product is rewritten to the codegen kernel") {
    val df = longArrays.selectExpr("id", s"$naive AS ip")
    assert(hasKernel(df), df.queryExecution.optimizedPlan.toString)
    assert(df.orderBy("id").collect().map(_.getLong(1)).toSeq ===
      Seq(1L * 4 + 2 * 5 + 3 * 6, -1L * 8 + 2 * 9))
  }

  test("rewrite matches the commuted operand order") {
    val df = longArrays.selectExpr("id",
      "aggregate(zip_with(a, b, (x, y) -> y * x), 0L, (s, x) -> x + s) AS ip")
    assert(hasKernel(df))
    assert(df.orderBy("id").collect().map(_.getLong(1)).toSeq ===
      Seq(32L, 10L))
  }

  test("rewritten plan agrees with explicit dot_product_l") {
    val df = longArrays.selectExpr(
      s"$naive AS naive_ip", "dot_product_l(a, b) AS kernel_ip")
    assert(df.collect().forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("double arrays are left alone") {
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .repartition(1)
      .selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, x) -> s + x) AS ip")
    assert(!hasKernel(df))
    assert(df.head().getDouble(0) === 11.0)
  }

  test("nullable-element arrays are left alone") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(LongType, containsNull = true)),
      StructField("b", ArrayType(LongType, containsNull = true))))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(Seq[Any](1L, null), Seq[Any](2L, 3L)))
    val df = spark.createDataFrame(rows, schema)
      .repartition(1)
      .selectExpr(s"$naive AS ip")
    assert(!hasKernel(df))
  }

  test("non-zero fold seed is left alone") {
    val df = longArrays.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 1L, (s, x) -> s + x) AS ip")
    assert(!hasKernel(df))
    assert(df.orderBy(org.apache.spark.sql.functions.col("ip"))
      .collect().map(_.getLong(0)).toSeq === Seq(11L, 33L))
  }

  test("non-dot-product lambda bodies are left alone") {
    val df = longArrays.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x + y), 0L, (s, x) -> s + x) AS ip")
    assert(!hasKernel(df))
  }

  test("ANSI-mode rewrites use the CHECKED kernel and raise on overflow") {
    // session default is ANSI → the rewritten kernel must be checked
    val df = longArrays.selectExpr("id", s"$naive AS ip")
    var checkedSeen = false
    df.queryExecution.optimizedPlan.transformAllExpressions {
      case e: DotProductLong => checkedSeen = e.checked; e
    }
    assert(checkedSeen)
    // overflow must raise (ANSI's promise), not wrap to a wrong value
    val big = Seq((Array(3037000500L), Array(3037000500L)))
      .toDF("a", "b").repartition(1)
      .selectExpr(s"$naive AS ip")
    val e = intercept[Exception](big.collect())
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(_.isInstanceOf[ArithmeticException]), e)
  }

  test("TRY-mode arithmetic is left alone (null-on-overflow contract)") {
    val df = longArrays.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> try_multiply(x, y)), 0L, " +
        "(s, x) -> s + x) AS ip")
    assert(!hasKernel(df))
  }
}
