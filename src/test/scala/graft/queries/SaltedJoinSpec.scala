package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Salted join: identical rows to the plain join on a deliberately
  * skewed key distribution, with the hot key spread across salt
  * sub-keys. */
class SaltedJoinSpec extends AnyFunSuite {

  test("salted inner join equals the plain join on skewed data") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 90% of probe rows share key 0 (the hot key)
    val probe = (1 to 500).map { i =>
      (if (i % 10 == 0) i.toLong % 7 else 0L, i.toLong)
    }.toDF("k", "payload")
    val build = Seq((0L, "hot"), (1L, "a"), (3L, "b"), (5L, "c"), (9L, "x"))
      .toDF("bk", "label")

    val plain = probe.join(build, col("k") === col("bk"))
      .select(col("k"), col("payload"), col("label"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

    val salted = SaltedJoin.saltedInner(
        probe, build, col("k"), col("bk"), salts = 8)
      .select(col("k"), col("payload"), col("label"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

    assert(salted.sorted.toSeq == plain.sorted.toSeq)
    assert(plain.count(_._1 == 0L) > 400) // the skew is real
  }

  test("salt values actually spread the hot key") {
    val spark = TestSpark.spark
    import spark.implicits._
    val probe = (1 to 400).map(i => (0L, i.toLong)).toDF("k", "payload")
    val salts = probe.withColumn("__salt",
        pmod(hash(struct(probe.columns.map(probe.col): _*),
          spark_partition_id()), lit(8)))
      .select(countDistinct(col("__salt"))).collect().head.getLong(0)
    assert(salts >= 6) // 400 rows over 8 salts: all (or nearly all) hit
  }
}
