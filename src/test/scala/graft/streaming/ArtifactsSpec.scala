package graft.streaming

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The artifact-read discipline ([[Artifacts.readParquet]]): only a
  * genuinely MISSING path is "first batch, empty state"; a corrupt
  * artifact must fail loudly — a maintainer that silently treats
  * corruption as a fresh start loses its accumulated state. */
class ArtifactsSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  test("missing path → None; present artifact → its rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("artifacts").toString
    assert(Artifacts.readParquet(spark, s"$dir/nope").isEmpty)
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.parquet(s"$dir/t")
    val got = Artifacts.readParquet(spark, s"$dir/t")
    assert(got.isDefined && got.get.count() == 2)
  }

  test("a corrupt artifact propagates instead of masquerading as " +
    "first-batch empty state") {
    val dir = Files.createTempDirectory("artifacts-bad").toString
    Files.createDirectory(Paths.get(s"$dir/t"))
    Files.write(Paths.get(s"$dir/t/part-00000.parquet"),
      "this is not parquet".getBytes("US-ASCII"))
    intercept[Exception] {
      Artifacts.readParquet(spark, s"$dir/t").get.collect()
    }
  }
}
