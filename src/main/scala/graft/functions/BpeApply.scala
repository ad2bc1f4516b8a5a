package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The BPE merge kernel shared by the interpreted and generated
  * paths of [[BpeApply]]/[[BpeApplyStep]] — the greedy leftmost
  * non-overlapping merge scan (Sennrich 2016's apply step) as one
  * primitive loop per merge, replacing the chained Catalyst
  * `aggregate()` HOF folds (CodegenFallback, interpreted per
  * element, O(len²) accumulator copies) the round-13 verdict
  * flagged. Semantics are EXACTLY the fold's: a stack scan where a
  * merged symbol can itself open the next match only as lhs; the
  * fold is retained in LlmQueries as the spec oracle
  * (BpeTrainSpec pins kernel == fold). */
object BpeKernel {

  /** One merge pass (a, b) → ab over a token array. */
  def mergeOnce(toks: Array[UTF8String], a: UTF8String,
      b: UTF8String, ab: UTF8String): Array[UTF8String] = {
    val out = new Array[UTF8String](toks.length)
    var n = 0
    var i = 0
    while (i < toks.length) {
      if (n > 0 && out(n - 1).equals(a) && toks(i).equals(b))
        out(n - 1) = ab
      else { out(n) = toks(i); n += 1 }
      i += 1
    }
    if (n == toks.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Code-point split — the same semantics as the HOF's
    * `transform(sequence(1, length(w)), i -> substring(w, i, 1))`
    * (Spark string positions are code points, not UTF-16 units). */
  def split(word: UTF8String): Array[UTF8String] = {
    val n = word.numChars()
    val out = new Array[UTF8String](n)
    var i = 0
    while (i < n) { out(i) = word.substringSQL(i + 1, 1); i += 1 }
    out
  }

  /** Character split + every merge applied in rank order — the
    * whole frozen-merge inference in one call. */
  def applyAll(word: UTF8String, lhs: Array[UTF8String],
      rhs: Array[UTF8String], merged: Array[UTF8String]): ArrayData = {
    var toks = split(word)
    var k = 0
    while (k < lhs.length) {
      toks = mergeOnce(toks, lhs(k), rhs(k), merged(k))
      k += 1
    }
    new GenericArrayData(toks.asInstanceOf[Array[Any]])
  }

  /** [[mergeOnce]] over Catalyst ArrayData (the step expression's
    * eval surface). */
  def stepArray(toks: ArrayData, a: UTF8String, b: UTF8String,
      ab: UTF8String): ArrayData = {
    val in = toks.toArray[UTF8String](StringType)
    new GenericArrayData(
      mergeOnce(in, a, b, ab).asInstanceOf[Array[Any]])
  }
}

/** `bpe_apply(word)` — frozen-merge BPE tokenization of one word:
  * code-point split, then the embedded merge list (rank order)
  * applied by [[BpeKernel]] in primitive loops. One expression
  * replaces the 12 chained interpreted folds of the previous
  * frozen-inference path (round 7's word_ngrams playbook). The
  * merge list is vocabulary-sized by construction (bpeRounds rows)
  * and travels as an expression reference — broadcast-by-value. */
case class BpeApply(child: Expression, lhs: Seq[String],
    rhs: Seq[String]) extends UnaryExpression with ExpectsInputTypes {
  require(lhs.length == rhs.length,
    "bpe_apply: lhs/rhs merge lists must align")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  @transient private lazy val lhsU =
    lhs.map(UTF8String.fromString).toArray
  @transient private lazy val rhsU =
    rhs.map(UTF8String.fromString).toArray
  @transient private lazy val mergedU =
    lhs.zip(rhs).map { case (a, b) =>
      UTF8String.fromString(a + b) }.toArray

  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.applyAll(input.asInstanceOf[UTF8String], lhsU, rhsU,
      mergedU)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeLhs", lhsU,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val rRef = ctx.addReferenceObj("bpeRhs", rhsU,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val mRef = ctx.addReferenceObj("bpeMerged", mergedU,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeKernel.applyAll(" +
        s"$c, $lRef, $rRef, $mRef);")
  }

  override protected def withNewChildInternal(
      c: Expression): BpeApply = copy(child = c)
  override def prettyName: String = "bpe_apply"
}

object BpeApply {
  def apply(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeApply(ColumnBridge.expression(word),
      merges.map(_._1), merges.map(_._2)))
}

/** `bpe_apply_step(toks)` — ONE merge (a, b) → ab over an existing
  * token array: the trainer's per-round application ([[BpeKernel]]
  * semantics, primitive loop instead of the interpreted fold). */
case class BpeApplyStep(child: Expression, a: String, b: String)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  @transient private lazy val aU = UTF8String.fromString(a)
  @transient private lazy val bU = UTF8String.fromString(b)
  @transient private lazy val abU = UTF8String.fromString(a + b)

  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.stepArray(input.asInstanceOf[ArrayData], aU, bU, abU)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeA", aU,
      "org.apache.spark.unsafe.types.UTF8String")
    val bRef = ctx.addReferenceObj("bpeB", bU,
      "org.apache.spark.unsafe.types.UTF8String")
    val abRef = ctx.addReferenceObj("bpeAb", abU,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeKernel.stepArray(" +
        s"$c, $aRef, $bRef, $abRef);")
  }

  override protected def withNewChildInternal(
      c: Expression): BpeApplyStep = copy(child = c)
  override def prettyName: String = "bpe_apply_step"
}

object BpeApplyStep {
  def apply(toks: Column, a: String, b: String): Column =
    ColumnBridge.column(
      BpeApplyStep(ColumnBridge.expression(toks), a, b))
}
