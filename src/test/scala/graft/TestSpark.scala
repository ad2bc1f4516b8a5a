package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local session for all specs (Spark startup is ~5 s;
  * per-suite sessions would dominate test time). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("graft-test")
    .getOrCreate()

  /** Triple-table DataFrame from flat tuples in Model.columns order
    * (nulls allowed in the two trailing nullable columns). */
  def triples(rows: Seq[(String, String, String, String, String, String,
      String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF(graft.rdf.Model.columns: _*)
  }
}
