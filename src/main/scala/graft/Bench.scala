package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** One timed run of a single query; `err` is the exception class+message
    * when the query failed (its wall time then measures a stack unwind,
    * not work — consumers must not average it in). */
  final case class QueryRun(name: String, sec: Double, err: Option[String])

  /** Timing core, separated from `main` so a spec can drive it with an
    * injected (possibly broken) query map and assert on the failure
    * surface without forking a JVM. */
  def run(
      spark: SparkSession,
      sfDir: String,
      queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame])
      : Seq[QueryRun] =
    // Fixed (sorted) timing order: Map iteration order is hash-order
    // and would shift per-query warm-up between rounds.
    queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
      QueryRun(name, (System.nanoTime() - t0) / 1e9, err)
    }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** The one-line bench JSON. Includes the host's 1-minute load average
    * so a contention-inflated artifact is self-diagnosing (BASELINE.md
    * documents several rounds where ambient driver load, not plan
    * changes, moved the numbers). */
  def renderJson(runs: Seq[QueryRun], sfDir: String): String = {
    val qs = runs.map(r => jsonStr(r.name) + ":" + r.sec)
      .mkString("{", ",", "}")
    val errs = runs.filter(_.err.isDefined)
      .map(r => jsonStr(r.name) + ":" + jsonStr(r.err.get))
      .mkString("{", ",", "}")
    val total = runs.map(_.sec).sum
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"load_avg_1m":$load,"sf":${jsonStr(sfDir)}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: JVM/JIT, parquet footer caches, codegen compilation —
    // so the first timed query doesn't absorb cold-start cost and
    // numbers are comparable across rounds.
    Seq("lineitem", "part", "documents", "embeddings", "orders")
      .foreach(t => Tables(spark, sfDir, t).count())
    val runs = run(spark, sfDir, SparkEntry.queries)
    println(renderJson(runs, sfDir))
    spark.stop()
    // A failed query is a failed bench: surface it in the exit code so
    // the driver can't mistake a stack unwind for a fast success.
    if (runs.exists(_.err.isDefined)) sys.exit(1)
  }
}
