package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.{Tables, TestSpark}

/** At 100 TB, exact COUNT(DISTINCT) over high-cardinality keys is a
  * two-phase shuffle monster; approx_count_distinct (HLL++) is the
  * standard swap (noted in rel_q07's scaladoc). The sketch isn't
  * oracle-comparable across engines (different HLL variants), so the
  * accuracy contract is pinned here instead. */
class SketchSpec extends AnyFunSuite {

  test("approx_count_distinct is within 5% of exact on customer keys") {
    val dir = "/root/testdata/sf0.001"
    val c = Tables(TestSpark.spark, dir, "customer")
    val exact = c.select(countDistinct(col("c_custkey"))).head().getLong(0)
    val approx = c.select(approx_count_distinct(col("c_custkey"), 0.02))
      .head().getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.05, s"exact=$exact approx=$approx err=$err")
  }
}
