package graft.queries

import java.sql.Timestamp

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property check for the batch sessionization (rel_q11): the
  * window-function formulation must equal a direct per-user fold over
  * the sorted events — on randomized event sets whose gaps straddle
  * the 12h threshold in both directions. */
class SessionsPropertySpec extends AnyFunSuite {

  private val gapUs = RelationalQueries.sessionGapUs

  /** Plain-Scala reference: sort each user's events, split on >gap,
    * aggregate. Mirrors the semantics, shares none of the code. */
  private def reference(rows: Seq[(Long, Long, Double)])
      : Set[(Long, Long, Long, Long, Long, Long, Double)] =
    rows.groupBy(_._1).flatMap { case (user, evs) =>
      val sorted = evs.map(e => (e._2, math.round(e._3 * 100))).sortBy(_._1)
      val sessions = sorted.tail.foldLeft(
        Vector(Vector(sorted.head))) { (acc, e) =>
        if (e._1 - acc.last.last._1 > gapUs) acc :+ Vector(e)
        else acc.init :+ (acc.last :+ e)
      }
      sessions.zipWithIndex.map { case (ss, i) =>
        val start = ss.head._1; val end = ss.last._1
        (user, (i + 1).toLong, ss.size.toLong, start, end, end - start,
          ss.map(_._2).sum.toDouble / 100.0)
      }
    }.toSet

  test("window sessionization equals the per-user fold on random data") {
    val spark = TestSpark.spark
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new Random(seed)
      val base = 1700000000000000L // µs
      val rows = (1 to 300).map { _ =>
        val user = rnd.nextInt(5).toLong
        // mixed gaps: mostly < 12h steps, occasional multi-day jumps
        val ts = base + math.abs(rnd.nextLong()) % (30L * 24 * 3600000000L)
        val value = math.round(rnd.nextDouble() * 10000) / 100.0
        (user, ts, value)
      }.distinct
      val df = rows.map { case (u, us, v) =>
        (u, new Timestamp(us / 1000), v)
      }.toDF("user_id", "ts", "value")
      // Timestamp constructor drops sub-ms precision; rebuild the µs
      // the engine will see so reference and engine agree exactly
      val seen = rows.map { case (u, us, v) => (u, us / 1000 * 1000, v) }
      val got = RelationalQueries.sessionsOf(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
      assert(got == reference(seen))
    }
  }
}
