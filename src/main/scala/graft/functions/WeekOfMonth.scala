package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DateType, IntegerType}
import org.apache.spark.sql.{functions => F}

/** Week-of-month, Postgres `to_char(date, 'W')` semantics
  * (reference src/sqls/create_objects.sql:31,34): W = (day_of_month-1)/7+1,
  * values 1..5, aligned to the month — NOT ISO calendar weeks. Spark has no
  * builtin (it bans the 'W' datetime pattern since 3.0), so this is the
  * engine's demonstrated custom-Expression seam.
  *
  * DateType is physically an Int (days since epoch) but day-of-month needs
  * calendar math, so we delegate to DateTimeUtils.getDayOfMonth — the same
  * intrinsic Spark's own `dayofmonth` codegen calls. The expression
  * participates in whole-stage codegen (doGenCode below), is null-safe, and
  * folds under constant inputs.
  */
case class WeekOfMonth(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "week_of_month"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DateType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"week_of_month requires DATE input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(date: Any): Any = {
    val dom = org.apache.spark.sql.catalyst.util.DateTimeUtils
      .getDayOfMonth(date.asInstanceOf[Int])
    (dom - 1) / 7 + 1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dtu = "org.apache.spark.sql.catalyst.util.DateTimeUtils"
    nullSafeCodeGen(ctx, ev, days =>
      s"${ev.value} = ($dtu.getDayOfMonth($days) - 1) / 7 + 1;")
  }

  override protected def withNewChildInternal(newChild: Expression): WeekOfMonth =
    copy(child = newChild)
}

object WeekOfMonth {

  /** Expression builder for the function registry: casts non-date input to
    * DATE first, mirroring the reference's `cast(date_time as date)` text
    * semantics (create_objects.sql:30).
    */
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "week_of_month takes exactly 1 argument")
    val c = exprs.head
    if (c.dataType == DateType) WeekOfMonth(c) else WeekOfMonth(Cast(c, DateType))
  }

  /** Column API — requires [[graft.GraftFunctions.register]] on the session. */
  def weekOfMonth(c: Column): Column = F.call_function("week_of_month", c)

  /** Pure-builtin fallback with identical semantics — kept under the same
    * tests as the custom expression (SURVEY.md §7.3). Integer division is
    * expressed with floor() because Spark's `/` on Column is double
    * division.
    */
  def weekOfMonthArith(c: Column): Column =
    (F.floor((F.dayofmonth(c) - F.lit(1)) / F.lit(7)) + F.lit(1)).cast(IntegerType)
}
