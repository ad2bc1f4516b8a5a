package graft.queries

import java.sql.Timestamp

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property check for the as-of attribution (rel_q12): the
  * union+last-window formulation must equal a direct "latest click
  * at-or-before each purchase" scan — on randomized event sets with
  * interleaved types and users. */
class AsofPropertySpec extends AnyFunSuite {

  /** Plain-Scala reference: for each purchase, the same user's click
    * with the greatest ts <= purchase ts (None if none). */
  private def reference(
      rows: Seq[(Long, Long, Long, String)])
      : Set[(Long, Long, Long, Option[Long], Option[Long])] =
    rows.filter(_._4 == "purchase").map { case (id, user, ts, _) =>
      val best = rows
        .filter(e => e._4 == "click" && e._2 == user && e._3 <= ts)
        .sortBy(e => (e._3, e._1)).lastOption
      (id, user, ts, best.map(_._1), best.map(_._3))
    }.toSet

  test("window as-of equals the direct scan on random data") {
    val spark = TestSpark.spark
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new Random(seed)
      val base = 1700000000000000L // µs
      val rows = (1L to 200L).map { id =>
        val user = rnd.nextInt(4).toLong
        val ts = base +
          (math.abs(rnd.nextLong()) % (10L * 24 * 3600000000L)) / 1000 * 1000
        val tpe = if (rnd.nextBoolean()) "purchase" else "click"
        (id, user, ts, tpe)
      }
      val df = rows.map { case (id, u, us, t) =>
        (id, u, new Timestamp(us / 1000), t)
      }.toDF("event_id", "user_id", "ts", "event_type")
      val got = RelationalQueries.asofOf(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]))).toSet
      assert(got == reference(rows))
    }
  }
}
