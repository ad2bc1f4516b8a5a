package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
// (codegen Block helpers imported locally in doGenCode)
import org.apache.spark.unsafe.types.UTF8String

/** IRI validity check used by the cleaning filters.
  *
  * The reference validates subjects/objects with `uritools
  * .is_valid_uri` (reference: src/export_from_omeka_s.py:54,66;
  * src/transform_datamodel.py:34). The engine's contract, chosen to be
  * expressible identically in the oracle SQL dialect:
  *
  *   valid  ⇔  `^[A-Za-z][A-Za-z0-9+.-]*:` scheme prefix, followed by
  *             ≥1 char, none of which is space, control (< 0x21),
  *             `<`, `>`, `"`, `{`, `}`, `|`, `\`, `^`, or backtick.
  *
  * Implemented as a native Catalyst expression (not a Scala UDF): a
  * single static-call in generated code, so it stays inside
  * whole-stage codegen with no serialization or null-boxing overhead
  * — this sits in the hot path of every cleaning pass over what would
  * be 100 TB of triples.
  */
object IriUtil {
  def isValidIri(s: UTF8String): Boolean = {
    if (s == null) return false
    val str = s.toString
    val n = str.length
    if (n < 3) return false
    val c0 = str.charAt(0)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return false
    var i = 1
    // scheme
    var colon = -1
    while (i < n && colon < 0) {
      val c = str.charAt(i)
      if (c == ':') colon = i
      else if (!((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-')) return false
      i += 1
    }
    if (colon < 0 || colon == n - 1) return false
    // rest: no spaces/control/illegal chars
    i = colon + 1
    while (i < n) {
      val c = str.charAt(i)
      if (c <= ' ' || c == '<' || c == '>' || c == '"' || c == '{' ||
        c == '}' || c == '|' || c == '\\' || c == '^' || c == '`') return false
      i += 1
    }
    true
  }

  /** The equivalent predicate for the DuckDB oracle (RE2 syntax). */
  def oracleRegex: String =
    "^[A-Za-z][A-Za-z0-9+.\\-]*:[^ <>\"{}|\\\\^`\\x00-\\x20]+$"

  def sqlPredicate(colName: String): String =
    s"regexp_matches($colName, '" + oracleRegex + "')"
}

case class IsValidIri(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override protected def nullSafeEval(input: Any): Any =
    IriUtil.isValidIri(input.asInstanceOf[UTF8String])
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false else nullSafeEval(v)
  }
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.value} = false;
        if (!${childGen.isNull}) {
          ${ev.value} = graft.functions.IriUtil.isValidIri(${childGen.value});
        }""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): IsValidIri =
    copy(child = c)
}

object IsValidIri {
  def apply(c: Column): Column =
    ColumnBridge.column(IsValidIri(ColumnBridge.expression(c)))
}
