package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** First-batch-vs-corruption discipline for streaming state
  * artifacts (label WALs, remap tables, stored indexes, probe
  * mirrors): "the artifact isn't there yet" is the ONLY condition a
  * maintainer may treat as empty state. A blanket
  * `catch AnalysisException` also swallows schema mismatches and
  * corrupt parquet footers — which would silently replace
  * accumulated state with a fresh start, the worst possible failure
  * mode for an incremental view. So existence is checked explicitly
  * on the path's own filesystem, and every OTHER read failure
  * propagates loudly. */
object Artifacts {

  /** True when `path` holds any artifact content: it exists and —
    * if a directory — contains at least one DATA file anywhere
    * under it. A bare directory is what a writer or tempdir helper
    * creates BEFORE the first commit, and `_SUCCESS` markers /
    * `_temporary` staging / dot-files are metadata Spark readers
    * ignore — all still first-batch, not content. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    if (fs.getFileStatus(p).isFile) return true
    def hidden(n: String) = n.startsWith("_") || n.startsWith(".")
    def hasData(d: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(d).exists { st =>
        !hidden(st.getPath.getName) &&
          (st.isFile || hasData(st.getPath))
      }
    hasData(p)
  }

  /** The parquet artifact at `path`, or None only when the path
    * does not exist / has no files yet (first batch); corruption
    * and schema errors propagate. */
  def readParquet(spark: SparkSession, path: String): Option[DataFrame] =
    if (exists(spark, path)) Some(spark.read.parquet(path)) else None
}
