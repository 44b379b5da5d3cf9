package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression extracting the numeric payload `temp=<d>`
  * from a turn's text — the hot-path scalar of the flagship classify stage
  * (reference semantics: `categorize_temp`,
  * `/root/reference/examples/temp_monitor_flow.py:94-103`).
  *
  * Why a custom Expression instead of a Scala UDF: `doGenCode` emits a
  * static call inside whole-stage codegen — no row boxing, no
  * Catalyst<->Scala converters, NULL handled by the generated null-check —
  * so a 100 TB scan's classify stage stays in the same generated loop as
  * the parquet reader and filter. (SURVEY.md §4.2, optional M8.)
  */
case class ParseTemp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"parse_temp expects STRING, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    ParseTemp.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ParseTemp.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): ParseTemp =
    copy(child = newChild)

  override def prettyName: String = "parse_temp"
}

object ParseTemp {
  /** Static helper invoked from generated code; NaN when absent/malformed. */
  def parse(s: UTF8String): Double = {
    if (s == null) return Double.NaN
    val str = s.toString
    val i = str.indexOf("temp=")
    if (i < 0) return Double.NaN
    var j = i + 5
    val n = str.length
    var end = j
    while (end < n && (str.charAt(end).isDigit || str.charAt(end) == '.' ||
        str.charAt(end) == '-')) end += 1
    if (end == j) Double.NaN
    else try str.substring(j, end).toDouble
    catch { case _: NumberFormatException => Double.NaN }
  }

  /** Column-API form. */
  def parse_temp(c: Column): Column =
    Bridge.column(ParseTemp(Bridge.expression(c)))

  /** Arity-checked SQL builder — the single source for every registration
    * path (temp-function and session-extension). */
  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 1) throw new IllegalArgumentException(
      s"parse_temp expects exactly 1 argument, got ${exprs.length}")
    ParseTemp(exprs.head)
  }

  /** Register as a SQL function (`SELECT parse_temp(text) ...`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerFunction(spark, "parse_temp", builder)
}
