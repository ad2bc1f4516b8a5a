package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed join keys.
  *
  * A shuffle join sends every row of a hot key to one reducer on BOTH
  * sides; one hot key (a default/placeholder id, an empty-string
  * join key) stalls the stage at corpus scale. The classic fix when
  * the build side is broadcastable-per-key but not overall: salt the
  * probe (skewed) side into `salts` sub-keys, replicate each build
  * row once per salt, and join on (key, salt) — the hot key's rows
  * spread over `salts` reducers at the cost of a `salts`× replication
  * of the build side.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) handles
  * this at runtime for sort-merge joins and is the first choice; this
  * operator is for when the skew is KNOWN (so the extra exchange-free
  * plan shape is predictable) or the join is not SMJ-shaped. Same
  * philosophy as [[SaltedAgg]]: the salt is a deterministic hash of
  * row content + partition id, never `rand()` — results are exact and
  * identical regardless of salt assignment.
  *
  * COMPOSITION with AQE skew handling (audited, AqeSkewComposeSpec):
  * the salt is part of the join KEY, so under
  * `spark.sql.adaptive.skewJoin.enabled=true` AQE sees an ordinary
  * equi-join on (key, salt) and may further split residual skew —
  * the two stack, results identical in every {salt} × {AQE} cell.
  * AQE skew-join splits JOINS only: skewed WINDOW partitions
  * (sessionization's per-user window) and skewed AGGREGATION groups
  * (the LSH bucket collect) are invisible to it, which is why those
  * two keep dedicated manual knobs.
  */
object SaltedJoin {

  /** Inner equi-join `probe ⨝ build` on `probeKey === buildKey` with
    * `salts`-way salting of the probe side. `build`'s columns must
    * not collide with `probe`'s. */
  def saltedInner(probe: DataFrame, build: DataFrame,
      probeKey: Column, buildKey: Column, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedProbe = probe.withColumn("__salt",
      pmod(hash(struct(probe.columns.map(probe.col): _*),
        spark_partition_id()), lit(salts)))
    val replicatedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedProbe
      .join(replicatedBuild, probeKey === buildKey &&
        saltedProbe("__salt") === replicatedBuild("__salt"))
      .drop("__salt")
  }
}
