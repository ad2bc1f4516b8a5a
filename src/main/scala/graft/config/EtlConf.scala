package graft.config

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.IriUtil
import graft.rdf.Vocab

/** Environment-driven pipeline configuration (SURVEY.md O11/O13).
  *
  * Grammar (reference: src/transform_datamodel.py:28–79; instantiated
  * in the workflow at muurschilderingendatabase-etl.yml:58–60):
  *
  *  - `FILTER<anything>=<predicate-IRI>` — every env var whose name
  *    starts with FILTER contributes its value to the predicate
  *    deny-list; values that are not valid IRIs are skipped with a
  *    warning (transform:36–37).
  *  - `MAP_<SRCNS>_<SRCPRED>=<TGTNS>.<tgtpred>` — predicate rename.
  *    The reference splits the key on '_' and uses only the first
  *    token after the namespace, so source predicates containing '_'
  *    are not addressable, and the predicate name is forcibly
  *    lowercased (bug B4, SURVEY §2.4). The engine keeps the
  *    documented lowercase behavior but joins the remaining tokens
  *    with '_' so underscore predicates *are* addressable — a strict
  *    superset of the reference grammar (delta documented here and
  *    tested).
  *
  * Namespace names resolve through the static catalog
  * ([[Vocab.namespaces]], O12). Unresolvable namespaces skip the
  * entry with a warning rather than failing the job (matching the
  * reference's lenient config handling).
  */
final case class EtlConf(
    mapping: Map[String, String],
    filterList: Seq[String],
    warnings: Seq[String])

object EtlConf {

  def fromEnv(env: Map[String, String]): EtlConf = {
    val warnings = Seq.newBuilder[String]

    val filters = env.toSeq.sortBy(_._1).collect {
      case (k, v) if k.startsWith("FILTER") =>
        if (IriUtil.isValidIri(UTF8String.fromString(v))) Some(v)
        else {
          warnings += s"$k: '$v' is not a valid IRI — skipped"
          None
        }
    }.flatten

    val mappings = env.toSeq.sortBy(_._1).collect {
      case (k, v) if k.startsWith("MAP_") =>
        parseMapping(k, v) match {
          case Right(pair) => Some(pair)
          case Left(w) => warnings += w; None
        }
    }.flatten.toMap

    EtlConf(mappings, filters, warnings.result())
  }

  /** `MAP_<SRCNS>_<SRCPRED…>` = `<TGTNS>.<tgtpred>` → (srcIRI, tgtIRI). */
  private def parseMapping(key: String,
      value: String): Either[String, (String, String)] = {
    val srcParts = key.split("_")
    if (srcParts.length < 3)
      return Left(s"$key: expected MAP_<NS>_<PRED> — skipped")
    val srcNs = srcParts(1)
    val srcPred = srcParts.drop(2).mkString("_").toLowerCase
    val tgtParts = value.split("\\.", 2)
    if (tgtParts.length != 2)
      return Left(s"$key: value '$value' is not <NS>.<pred> — skipped")
    (Vocab.resolveNamespace(srcNs), Vocab.resolveNamespace(tgtParts(0))) match {
      case (Some(sns), Some(tns)) =>
        Right((sns + srcPred, tns + tgtParts(1)))
      case (None, _) => Left(s"$key: unknown source namespace '$srcNs' — skipped")
      case (_, None) =>
        Left(s"$key: unknown target namespace '${tgtParts(0)}' — skipped")
    }
  }
}
