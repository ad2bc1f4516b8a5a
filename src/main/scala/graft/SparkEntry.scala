package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.llm.LlmQueries
import graft.queries._
import graft.rdf.RdfQueries
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The flagship is the reference's whole job: the composed
    * EP1→EP2 pipeline (clean → enrich → rename → delete, SURVEY §3). */
  def entry(spark: SparkSession): DataFrame =
    RdfQueries.queries("rdf_pipeline_e2e")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2 (rdf_ keys),
    * plus the LLM-pipeline extensions (llm_ / mm_ keys) and the
    * relational engine-extension suite (rel_ keys). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RdfQueries.queries ++ LlmQueries.queries ++ RelationalQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RdfQueries.oracleSql ++ LlmQueries.oracleSql ++ RelationalQueries.oracleSql
}
