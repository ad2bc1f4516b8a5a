package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The property Z-ordering exists for, MEASURED: after a
  * range-partitioned write on the Morton key, each file's
  * (min,max) footer box bounds a small rectangle of the 2-D domain,
  * so a point/range predicate on EITHER dimension prunes most files
  * — where a round-robin layout leaves every file covering the whole
  * domain. Also pins the interleave arithmetic against a bit-string
  * reference. */
class ZOrderSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("zval == bit-interleave reference on boundary and random " +
      "coordinates") {
    val s = spark
    import s.implicits._
    def ref(a: Long, b: Long): Long = {
      var acc = 0L
      for (i <- 15 to 0 by -1)
        acc = acc * 4 + ((a >> i) & 1) * 2 + ((b >> i) & 1)
      acc
    }
    val pts = Seq((0L, 0L), (65535L, 65535L), (0L, 65535L),
      (65535L, 0L), (1L, 2L), (43690L, 21845L), (12345L, 54321L))
    val got = pts.toDF("ux", "tx")
      .select(col("ux"), col("tx"),
        RelationalQueries.zval(col("ux"), col("tx")).as("zv"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === pts.map { case (a, b) => (a, b, ref(a, b)) }.toSet)
  }

  /** Per-file bounding boxes of a written layout. */
  private def boxes(path: String): Seq[(Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith("part-"))
      .toSeq.map { f =>
        s.read.parquet(f.getAbsolutePath)
          .agg(min("ux"), max("ux"), min("tx"), max("tx"))
          .as[(Long, Long, Long, Long)].head()
      }
  }

  test("z-ordered files bound small boxes; point predicates prune " +
      "most files (round-robin layout prunes none)") {
    val s = spark
    import s.implicits._
    // uniform 64x64 grid scaled into the 16-bit domain: every cell
    // distinct in both dims, no accidental clustering to flatter one
    // layout
    val grid = s.range(0, 4096)
      .select((col("id") % 64 * 1024).as("ux"),
        (col("id") / 64).cast("long").multiply(1024).as("tx"))
    val base = Files.createTempDirectory("zorder").toFile.getAbsolutePath
    RelationalQueries.zorderWrite(grid, s"$base/z", 16)
    grid.repartition(16).write.mode("overwrite")
      .parquet(s"$base/rr")
    val zB = boxes(s"$base/z")
    val rrB = boxes(s"$base/rr")
    assert(zB.size == 16 && rrB.size == 16)
    val domainArea = 65536.0 * 65536.0
    def area(b: (Long, Long, Long, Long)): Double =
      (b._2 - b._1 + 1).toDouble * (b._4 - b._3 + 1).toDouble
    // each z file covers ~1/16 of the domain (Morton boxes are near-
    // square); round-robin files each cover essentially ALL of it
    assert(zB.map(area).max <= domainArea / 8,
      s"z boxes too large: ${zB.map(area).max / domainArea}")
    assert(rrB.map(area).min >= domainArea / 2,
      "round-robin unexpectedly clustered — fixture broken")
    // point-lookup pruning: files whose box contains the probe point
    def hits(bs: Seq[(Long, Long, Long, Long)], ux: Long, tx: Long) =
      bs.count(b => ux >= b._1 && ux <= b._2 && tx >= b._3 && tx <= b._4)
    assert(hits(zB, 33 * 1024, 40 * 1024) <= 2)
    assert(hits(rrB, 33 * 1024, 40 * 1024) == 16)
  }

  test("compaction restores clustering after unclustered appends, " +
      "preserving the row set") {
    val s = spark
    import s.implicits._
    val grid = s.range(0, 4096)
      .select((col("id") % 64 * 1024).as("ux"),
        (col("id") / 64).cast("long").multiply(1024).as("tx"))
    val base = Files.createTempDirectory("zcompact").toFile.getAbsolutePath
    val path = s"$base/t"
    RelationalQueries.zorderWrite(grid, path, 16)
    // an unclustered append: a shuffled slice whose files span the
    // whole domain
    grid.filter(col("ux") % 4096 === 0).repartition(4)
      .write.mode("append").parquet(path)
    val before = boxes(path)
    val domainArea = 65536.0 * 65536.0
    def area(b: (Long, Long, Long, Long)): Double =
      (b._2 - b._1 + 1).toDouble * (b._4 - b._3 + 1).toDouble
    assert(before.map(area).max >= domainArea * 0.8,
      "append unexpectedly clustered — fixture broken")
    val rows = s.read.parquet(path).as[(Long, Long)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    RelationalQueries.zorderCompact(s, path, 16)
    val after = boxes(path)
    assert(after.size == 16)
    // range-sampled boundaries need not align exactly with
    // z-quadrant seams (a straddling cut inherits the parent
    // quadrant's box), so assert the OUTCOME: whole-domain boxes are
    // gone and a point predicate prunes almost everything again
    assert(after.map(area).max <= domainArea / 3,
      s"compaction left a loose box: ${after.map(area).max / domainArea}")
    def hits(bs: Seq[(Long, Long, Long, Long)], ux: Long, tx: Long) =
      bs.count(b => ux >= b._1 && ux <= b._2 && tx >= b._3 && tx <= b._4)
    assert(hits(after, 33 * 1024, 40 * 1024) <= 3)
    val rowsAfter = s.read.parquet(path).as[(Long, Long)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(rowsAfter === rows, "compaction changed the row multiset")
  }
}
