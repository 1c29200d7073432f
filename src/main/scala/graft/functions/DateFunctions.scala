package graft.functions

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Date-handling custom expressions (SURVEY §2.8 date table).
  *
  * `convert_two_digit_years` mirrors the reference's century pivot
  * (R/functions.R:279-285): RCA order dates are M/d/yy or M/d/yyyy; a
  * two-digit year > 63 is 19xx, else 20xx (oldest RCA record is 1964).
  * Blank input maps to the 1900-01-01 sentinel (R/functions.R:265).
  */
object DateFunctions {

  private val out = DateTimeFormatter.ISO_LOCAL_DATE
  val Sentinel: LocalDate = LocalDate.of(1900, 1, 1)

  def parseFlexibleDate(s: String): LocalDate = {
    val t = if (s == null) "" else s.trim
    if (t.isEmpty) return Sentinel
    val parts = t.split("/")
    require(parts.length == 3, s"not M/d/y: $t")
    val m = parts(0).toInt
    val d = parts(1).toInt
    val yRaw = parts(2).toInt
    val y =
      if (parts(2).length <= 2) { if (yRaw > 63) 1900 + yRaw else 2000 + yRaw }
      else yRaw
    LocalDate.of(y, m, d)
  }

  /** convert_two_digit_years(str) → DateType (days since epoch).
    * Null input → null (standard nullSafeEval contract); EMPTY STRING →
    * 1900-01-01 sentinel. Callers reading sources that deliver blanks
    * as null (e.g. Spark's CSV reader) must coalesce to "" first if
    * they want the sentinel — see processChronology.
    */
  case class TwoDigitYearDate(child: Expression) extends UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = DateType
    override def nullSafeEval(v: Any): Any =
      parseFlexibleDate(v.toString).toEpochDay.toInt
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(c)
    override def prettyName: String = "convert_two_digit_years"
  }

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst
        .FunctionIdentifier("convert_two_digit_years")))
      reg.createOrReplaceTempFunction(
        "convert_two_digit_years",
        es => TwoDigitYearDate(es.head), "scala_udf")
  }

  def convert_two_digit_years(c: Column): Column =
    call_function("convert_two_digit_years", c)
}
