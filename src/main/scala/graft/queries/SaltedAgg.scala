package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase salted aggregation for skewed group keys.
  *
  * A plain `groupBy(key).agg(sum)` sends every row of a hot key to
  * one reducer; at 100 TB a single skewed key (a boilerplate
  * document, an empty-string predicate, a null-ish bucket) stalls the
  * stage. Salting splits each key into `salts` sub-groups for the
  * partial aggregation, then re-aggregates the (small) per-salt
  * results — turning one hot reducer into `salts` balanced ones at
  * the cost of a second tiny shuffle.
  *
  * AQE's skew-join handling covers *joins*; aggregation skew still
  * needs this pattern (or `spark.sql.adaptive` advisory partition
  * splitting, which cannot split a single group).
  *
  * The salt hashes row content + partition id (the partition id
  * spreads byte-identical duplicate rows, which content alone would
  * re-concentrate). No `rand()`: the final result is exact and
  * identical regardless of salt assignment — only the load balance
  * varies — so the operator stays deterministic where it matters.
  */
object SaltedAgg {

  /** Sum + count per key with `salts`-way salting. Associative
    * aggregates only (sum/count/min/max — anything that re-aggregates
    * losslessly). */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      salts: Int): DataFrame = {
    require(salts > 0)
    val salted = df.select(key.as("k"), value.as("v"))
      .withColumn("salt", pmod(hash(col("k"), col("v"),
        spark_partition_id()), lit(salts)))
    salted
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("ps"), count(lit(1)).as("pc"))
      .groupBy(col("k"))
      .agg(sum(col("ps")).as("sum_v"), sum(col("pc")).as("n"))
  }
}
