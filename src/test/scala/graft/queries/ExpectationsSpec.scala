package graft.queries

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The data-quality expectation suite ([[RelationalQueries
  * .expectationsOf]]): every constraint must count EXACTLY its own
  * seeded violations on a hand-built orders table — and nothing
  * else's (a scan with one fault must flip one row). */
class ExpectationsSpec extends AnyFunSuite {

  private val s = TestSpark.spark
  import s.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")

  private def run(rows: Seq[(Long, Long, String, Double,
      Timestamp, String)], custkeys: Seq[Long]): Map[String, (Long, Long, Boolean)] = {
    val ord = rows.toDF("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val cust = custkeys.toDF("c_custkey")
    RelationalQueries.expectationsOf(ord, cust).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
  }

  test("clean table: six constraints, zero violations, all pass") {
    val got = run(Seq(
      (1L, 10L, "O", 100.0, t0, "1-URGENT"),
      (2L, 11L, "F", 200.0, t0, "3-MEDIUM")), Seq(10L, 11L))
    assert(got.size == 6)
    assert(got.values.forall { case (tot, v, p) =>
      tot == 2L && v == 0L && p })
  }

  test("each seeded fault flips exactly its own constraint") {
    val got = run(Seq(
      (1L, 10L, "O", 100.0, t0, "1-URGENT"),     // clean
      (1L, 10L, "F", 200.0, t0, "2-HIGH"),       // dup key
      (3L, 99L, "O", 300.0, t0, "3-MEDIUM"),     // dangling custkey
      (4L, 10L, "X", 400.0, t0, "4-NOT SPEC"),   // bad status
      (5L, 11L, "P", -1.0, t0, "5-LOW"),         // below range
      (6L, 11L, "P", 700000.0, t0, "5-LOW"),     // above range
      (7L, 11L, "O", 500.0, null, "1-URGENT"),   // null date
      (8L, 11L, "F", 600.0, t0, "")),            // empty priority
      Seq(10L, 11L))
    assert(got("orders.o_orderkey.unique") == ((8L, 1L, false)))
    assert(got("orders.o_custkey.ref_customer") == ((8L, 1L, false)))
    assert(got("orders.o_orderstatus.values") == ((8L, 1L, false)))
    assert(got("orders.o_totalprice.range") == ((8L, 2L, false)))
    assert(got("orders.o_orderdate.complete") == ((8L, 1L, false)))
    assert(got("orders.o_orderpriority.complete") == ((8L, 1L, false)))
  }

  test("output is ordered by expectation name") {
    val ord = Seq((1L, 10L, "O", 1.0, t0, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
    val names = RelationalQueries
      .expectationsOf(ord, Seq(10L).toDF("c_custkey"))
      .collect().map(_.getString(0)).toSeq
    assert(names == names.sorted)
  }
}
