package graft.sources

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.rdf.{Model, Turtle, Vocab}

/** Hadoop `Configuration` is not `java.io.Serializable`; this wrapper
  * ships the DRIVER's session conf (S3A/ABFS credentials, endpoints,
  * custom FS settings) to executor-side readers/writers via its
  * `write`/`readFields` wire format — without it, executors would
  * fall back to a default `new Configuration()` and fail on any
  * non-default object store. */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  @throws[IOException]
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  @throws[IOException]
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** DataSourceV2 Turtle codec: `spark.read.format("turtle").load(dir)`
  * yields the canonical triple table (Model.schema), and
  * `df.write.format("turtle").mode("overwrite").save(dir)` publishes
  * it back as one self-contained Turtle document per partition
  * (the reference's final publish step is exactly such an
  * overwrite-into-store write, muurschilderingendatabase-etl.yml:87).
  *
  * Partitioning unit = one Turtle *document* (file): Turtle is not
  * line-splittable (`@prefix` scopes the document — SURVEY §7 "what's
  * hard" #1), so each file is one `InputPartition` parsed whole on an
  * executor by [[Turtle.parseDocument]]. A paginated export
  * (page-per-file, ≤100 items each) therefore parallelizes per page.
  * Large single-file corpora should be re-sharded upstream — the
  * reader refuses nothing but scales with file count, like the
  * built-in `wholetext` text source.
  *
  * Options:
  *  - `graph` (read): graph id column value, default "default".
  *  - `scope_bnodes` (read): rewrite blank-node labels with a
  *    per-document content-hash prefix so same-labeled bnodes from
  *    different files don't conflate (RDF document scoping); default
  *    false for byte-stable round-trips of this source's own output.
  *  - `prefixes` (write): JSON object `{prefix: namespaceIri, ...}`
  *    for the emitted `@prefix` headers; defaults to the static
  *    vocabulary catalog.
  *
  * Set semantics (dropDuplicates) are intentionally NOT applied by the
  * scan — a scan should not shuffle; callers opt in via
  * [[graft.rdf.TripleGraph]] / `dropDuplicates`.
  */
class TurtleDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "turtle"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Model.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new TurtleTable(properties.asScala.toMap)
}

final class TurtleTable(properties: Map[String, String])
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = "turtle"
  override def schema(): StructType = Model.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val paths = TurtleDataSource.resolvePaths(options)
    val graphId = options.getOrDefault("graph", "default")
    val scopeBnodes = options.getBoolean("scope_bnodes", false)
    () => new TurtleScan(paths, graphId, scopeBnodes)
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val path = Option(info.options.get("path")).getOrElse(
      throw new IllegalArgumentException("turtle write requires a path"))
    val prefixes = TurtleDataSource.resolvePrefixes(info.options)
    // syntax=trig emits GRAPH blocks so the graph column round-trips
    // (plain Turtle cannot encode it — that is TriG's whole point);
    // syntax=nt emits line-splittable N-Triples (no prefixes, no
    // graph column); anything but the known syntaxes is an error,
    // not a silent fallback that would drop the graph column
    val syntax =
      info.options.getOrDefault("syntax", "turtle").toLowerCase match {
        case "trig" => "trig"
        case "nt" | "ntriples" => "nt"
        case "turtle" | "ttl" => "turtle"
        case other => throw new IllegalArgumentException(
          s"unknown turtle write syntax '$other' (use turtle, trig or nt)")
      }
    new TurtleWriteBuilder(path, prefixes, info.schema(), syntax)
  }
}

final class TurtleScan(paths: Seq[String], graphId: String,
    scopeBnodes: Boolean) extends Scan with Batch {
  // the session conf is captured on the DRIVER at plan time and
  // serialized into the reader factory — executor-side readers must
  // see the same credentials/FS settings the driver planned with
  private val hadoopConf = new SerializableHadoopConf(
    org.apache.spark.sql.classic.SparkSession.active
      .sessionState.newHadoopConf())
  override def readSchema(): StructType = Model.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(hadoopConf.value)
      // glob patterns ("dir/*.ttl") expand like every built-in file
      // source; a glob matching directories lists each one level deep
      val matched =
        if (p.exists("*?[{".contains(_))) {
          val hits =
            Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
          // built-in-source parity: a dead glob is an error, not an
          // empty (and silently wrong) corpus
          if (hits.isEmpty)
            throw new IllegalArgumentException(s"Path does not exist: $p")
          hits
        } else Seq(fs.getFileStatus(path))
      matched.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq
            .filter(s => s.isFile && isVisible(s.getPath))
            .map(s => TurtleFilePartition(s.getPath.toString))
        else if (isVisible(st.getPath))
          Seq(TurtleFilePartition(st.getPath.toString))
        else Seq.empty
      }
    }.toArray

  /** Hidden/metadata/temp files (`_staging-*`, `_SUCCESS`, dot-files
    * — incl. this source's own crash leftovers) are never data, same
    * convention as every Hadoop input format. */
  private def isVisible(p: Path): Boolean = {
    val n = p.getName
    !n.startsWith("_") && !n.startsWith(".")
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TurtleReaderFactory(graphId, scopeBnodes, hadoopConf)
}

final case class TurtleFilePartition(file: String) extends InputPartition

final class TurtleReaderFactory(graphId: String, scopeBnodes: Boolean,
    hadoopConf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[TurtleFilePartition].file
    new PartitionReader[InternalRow] {
      private val rows: Iterator[InternalRow] = {
        val path = new Path(file)
        val fs = path.getFileSystem(hadoopConf.value)
        val in = fs.open(path)
        val text = try {
          new String(org.apache.commons.io.IOUtils.toByteArray(in),
            java.nio.charset.StandardCharsets.UTF_8)
        } finally in.close()
        Turtle.parseDocument(text, graphId, scopeBnodes).iterator.map { t =>
          InternalRow.fromSeq(t.productIterator.map {
            case null => null
            case s: String => UTF8String.fromString(s)
          }.toSeq)
        }
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

// ---------------------------------------------------------------------
// Write path (O9/O19 publish sink)
// ---------------------------------------------------------------------

final class TurtleWriteBuilder(path: String,
    prefixes: Seq[(String, String)], schema: StructType, syntax: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new TurtleBatchWrite(path, prefixes, schema, doTruncate, syntax)
  }
}

/** One self-contained Turtle document (own `@prefix` header) per
  * partition. Tasks write into a hidden `_staging-<uuid>/` directory
  * (task-temp file + rename-on-task-commit, so failed or speculative
  * tasks never leave partial documents); the JOB commit then clears
  * the previous corpus (truncate = `mode("overwrite")`, the
  * reference's overwrite-into-named-graph publish semantic) and moves
  * the staged files into place, so a failed job leaves the previous
  * publish intact — the failure window shrinks to the commit move
  * itself (true atomicity needs a transactional table format; the
  * reader also skips `_`/`.` files, so even a crash mid-commit never
  * reads staging leftovers as data). */
final class TurtleBatchWrite(path: String, prefixes: Seq[(String, String)],
    schema: StructType, truncate: Boolean, syntax: String)
    extends BatchWrite {
  private val hadoopConf = new SerializableHadoopConf(
    org.apache.spark.sql.classic.SparkSession.active
      .sessionState.newHadoopConf())
  private val stagingName = "_staging-" + java.util.UUID.randomUUID()

  private def fs = new Path(path).getFileSystem(hadoopConf.value)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val staging = new Path(path, stagingName)
    fs.mkdirs(staging)
    val idx = Model.columns.map(schema.fieldIndex) // graph first
    new TurtleWriterFactory(staging.toString, prefixes, idx, hadoopConf,
      syntax)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val staging = new Path(path, stagingName)
    if (truncate)
      fs.listStatus(dir).foreach { st =>
        if (st.getPath.getName != stagingName) fs.delete(st.getPath, true)
      }
    fs.listStatus(staging).foreach { st =>
      val dest = new Path(dir, st.getPath.getName)
      if (fs.exists(dest)) fs.delete(dest, false)
      if (!fs.rename(st.getPath, dest))
        throw new java.io.IOException(
          s"turtle write: rename ${st.getPath} -> $dest failed")
    }
    fs.delete(staging, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val staging = new Path(path, stagingName)
    if (fs.exists(staging)) fs.delete(staging, true)
  }
}

final case class TurtleCommit(file: String) extends WriterCommitMessage

final class TurtleWriterFactory(stagingDir: String,
    prefixes: Seq[(String, String)], idx: Seq[Int],
    hadoopConf: SerializableHadoopConf, syntax: String)
    extends DataWriterFactory {
  private val ext = syntax match {
    case "trig" => "trig"; case "nt" => "nt"; case _ => "ttl"
  }
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val tmp =
        new Path(stagingDir, s".tmp-$partitionId-$taskId.$ext")
      private val fin =
        new Path(stagingDir, f"part-$partitionId%05d.$ext")
      private val fs = tmp.getFileSystem(hadoopConf.value)
      private val out = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(fs.create(tmp, true),
          java.nio.charset.StandardCharsets.UTF_8))
      private var wroteHeader = false

      override def write(r: InternalRow): Unit = {
        if (!wroteHeader) {
          // N-Triples has no prefix syntax — header only for ttl/trig
          if (syntax != "nt")
            Turtle.header(prefixes).foreach { l =>
              out.write(l); out.write("\n")
            }
          wroteHeader = true
        }
        def s(j: Int): String =
          if (r.isNullAt(idx(j))) null else r.getUTF8String(idx(j)).toString
        if (syntax == "nt")
          out.write(Turtle.ntStatement(s(1), s(2), s(3), s(4), s(5), s(6),
            s(7)))
        else {
          val stmt = Turtle.statement(s(1), s(2), s(3), s(4), s(5), s(6),
            s(7), prefixes)
          if (syntax == "trig")
            out.write(Turtle.trigStatement(s(0), stmt, "default"))
          else out.write(stmt)
        }
        out.write("\n")
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        if (!wroteHeader) { fs.delete(tmp, false); TurtleCommit("") }
        else {
          // rename is idempotent under task retry: same partitionId →
          // same final name, last successful attempt wins. A false
          // return (object stores don't throw) must fail the task —
          // silently losing a partition is the worst outcome.
          if (fs.exists(fin)) fs.delete(fin, false)
          if (!fs.rename(tmp, fin))
            throw new java.io.IOException(
              s"turtle write: rename $tmp -> $fin failed")
          TurtleCommit(fin.toString)
        }
      }
      override def abort(): Unit = {
        out.close()
        if (fs.exists(tmp)) fs.delete(tmp, false)
      }
      override def close(): Unit = ()
    }
}

object TurtleDataSource {
  private[sources] def resolvePaths(
      options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).map { json =>
      // Spark encodes .load(p1, p2, ...) as a JSON array in "paths"
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      mapper.readTree(json).elements().asScala.map(_.asText()).toSeq
    }
    multi.getOrElse(Option(options.get("path")).toSeq)
  }

  /** Write-side `prefixes` option: a JSON object `{prefix: iri}`;
    * falls back to the static vocabulary catalog. Sorted for a
    * deterministic header. */
  private[sources] def resolvePrefixes(
      options: CaseInsensitiveStringMap): Seq[(String, String)] = {
    val m = Option(options.get("prefixes")).map { json =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(json)
      root.fields().asScala.filter(_.getValue.isTextual)
        .map(e => e.getKey -> e.getValue.asText()).toMap
    }.getOrElse(Vocab.namespaces)
    m.toSeq.sortBy(_._1)
  }

  /** JSON-encode a prefix map for the write option (inverse of
    * [[resolvePrefixes]]). */
  def prefixesOption(prefixes: Map[String, String]): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    prefixes.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    mapper.writeValueAsString(node)
  }
}
