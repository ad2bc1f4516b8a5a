package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-Lines codec for document corpora — THE interchange format of
  * LLM training-data pipelines (one JSON object per line; every
  * public corpus release ships this way). The engine's native store
  * is parquet; this source/sink is the boundary where a corpus
  * enters or leaves it.
  *
  * Scale shape, both directions:
  *
  *  - WRITE is a pure map-side projection (`to_json` over a struct,
  *    codegen'd) into Spark's text sink — no exchange, one output
  *    file per task, embedded newlines/quotes/unicode escaped by the
  *    JSON encoder so the line framing is unbreakable by content.
  *  - READ pins an explicit schema, which at 100 TB is not a
  *    convenience but a scan saved: schema INFERENCE is a full extra
  *    pass over the corpus before the real one (Spark samples every
  *    file). Newline-delimited JSON splits on line boundaries, so a
  *    single huge file still fans out across executors.
  *  - FAILFAST read mode: a malformed line fails the job instead of
  *    dissolving into nulls — the engine's surface-failures contract
  *    (SURVEY.md §2 error-handling; the reference's swallow-and-
  *    exit-0 is the behavior we deliberately do NOT keep).
  */
object JsonlDocs {

  /** The documents-table schema (TESTDATA.md), pinned for the read
    * path. Field order matches the parquet table so a roundtrip is
    * column-identical, not just value-identical. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val fields = schema.fields.map(f => col(f.name))

  /** Serialize a documents frame to JSONL at `path` (overwrite). */
  def write(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(fields: _*)).as("value"))
      .write.mode("overwrite").text(path)

  /** Read a JSONL corpus back with the pinned schema, FAILFAST. */
  def read(s: SparkSession, path: String): DataFrame =
    s.read.schema(schema).option("mode", "FAILFAST").json(path)
      .select(fields: _*)
}
