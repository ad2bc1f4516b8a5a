package graft.plans

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Native as-of join: randomized equivalence against a brute-force
  * reference, null-key/null-ts semantics, and the plan shape that
  * justifies the operator (one exchange per side, no union). */
class AsofJoinPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches the brute-force as-of on random data") {
    (1 to 3).foreach { seed =>
      val rnd = new Random(seed)
      // unique timestamps per user on the right → the max-ts match is
      // a unique row, so row identity (not just ts) is checkable
      val rights = (0 until 120).map { i =>
        (1000L + i, rnd.nextInt(5).toLong, (rnd.nextInt(500) * 120L) + i)
      }.distinct
      val lefts = (0 until 80).map { i =>
        (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(60000).toLong)
      }
      val ldf = lefts.toDF("pid", "user_id", "ts_us")
      val rdf = rights.toDF("cid", "user_id", "c_us")
      val got = AsofJoinOps.asof(ldf, rdf, "user_id", "ts_us", "c_us")
        .collect()
        .map(r => (r.getLong(0),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long]))).toSet
      val expected = lefts.map { case (pid, u, ts) =>
        val best = rights.filter(c => c._2 == u && c._3 <= ts)
          .sortBy(_._3).lastOption
        (pid, best.map(_._1), best.map(_._3))
      }.toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("null keys and null timestamps never match") {
    val ldf = Seq(
      (1L, Option(1L), Option(10L)),
      (2L, Option.empty[Long], Option(10L)),
      (3L, Option(1L), Option.empty[Long]),
    ).toDF("pid", "user_id", "ts_us")
    val rdf = Seq(
      (100L, Option(1L), Option(5L)),
      (101L, Option.empty[Long], Option(5L)),
      (102L, Option(1L), Option.empty[Long]),
    ).toDF("cid", "user_id", "c_us")
    val got = AsofJoinOps.asof(ldf, rdf, "user_id", "ts_us", "c_us")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got == Map(1L -> Some(100L), 2L -> None, 3L -> None))
  }

  test("plan: AsofJoinExec with one exchange per side and no union") {
    val ldf = Seq((1L, 1L, 10L)).toDF("pid", "user_id", "ts_us")
      .repartition(2)
    val rdf = Seq((9L, 1L, 5L)).toDF("cid", "user_id", "c_us")
      .repartition(2)
    val df = AsofJoinOps.asof(ldf, rdf, "user_id", "ts_us", "c_us")
    df.collect() // force planning + execution
    // under AQE the string repeats the plan ("Initial Plan"); assert
    // on the final section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("Union"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
  }

  test("tolerance bounds the match age without losing the buffer") {
    val ldf = Seq((1L, 7L, 60L), (2L, 7L, 105L))
      .toDF("pid", "user_id", "ts_us")
    val rdf = Seq((900L, 7L, 10L), (901L, 7L, 100L))
      .toDF("cid", "user_id", "c_us")
    val got = AsofJoinOps.asof(ldf, rdf, "user_id", "ts_us", "c_us",
        tolerance = 20L)
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    // pid 1 at 60: maximal match is cid 900 (c_us 10), age 50 > 20 →
    // null; pid 2 at 105: cid 901 (c_us 100), age 5 ≤ 20 → match —
    // the buffer advanced past the rejected match without losing it
    assert(got == Map(1L -> None, 2L -> Some(901L)))

    // overflow guard: a sentinel far-past timestamp must NOT sneak
    // under a finite tolerance via signed wraparound
    val lx = Seq((1L, 7L, 10L)).toDF("pid", "user_id", "ts_us")
    val rx = Seq((900L, 7L, Long.MinValue)).toDF("cid", "user_id", "c_us")
    val gx = AsofJoinOps.asof(lx, rx, "user_id", "ts_us", "c_us",
        tolerance = 20L)
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(gx == Map(1L -> None))
  }

  test("rejects missing and non-bigint columns") {
    val ldf = Seq((1L, "a", 10L)).toDF("pid", "user_id", "ts_us")
    val rdf = Seq((9L, "a", 5L)).toDF("cid", "user_id", "c_us")
    val e = intercept[IllegalArgumentException] {
      AsofJoinOps.asof(ldf, rdf, "user_id", "ts_us", "c_us")
    }
    assert(e.getMessage.contains("must be bigint"))
    val e2 = intercept[IllegalArgumentException] {
      AsofJoinOps.asof(ldf, rdf, "nope", "ts_us", "c_us")
    }
    assert(e2.getMessage.contains("not found"))
  }
}
