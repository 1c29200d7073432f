package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The 48-bit md5 prefix hash of a string — the gram/token hash every
  * portable (oracle-matched) dedup plan keys on, as a native codegen'd
  * Catalyst expression.
  *
  * Value contract (unchanged from the composed form): the first 12 hex
  * characters of md5 = the first 6 digest bytes big-endian, a value in
  * [0, 2^48) that DuckDB recomputes as
  * `CAST('0x' || substr(md5(x), 1, 12) AS BIGINT)`. The composed Spark
  * plan — `conv(substring(md5(cast binary), 1, 12), 16, 10)` — pays,
  * PER GRAM, a fresh MessageDigest instance, a 32-char hex encode, a
  * substring, and a base-16 reparse of the bytes the digest already
  * held; at ~10⁶ grams/second/core the signature stage of every band
  * table was dominated by that overhead. This expression digests into
  * a thread-local MessageDigest and folds the 6 bytes directly — same
  * value, no hex round-trip — and composes into whole-stage codegen
  * like [[RollingHash]]. TextSpec pins expression ≡ kernel ≡ composed
  * form equality.
  */
object Md5Hash48 {

  private val tlMd = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Hot-path kernel (called from generated code): md5 the UTF-8 bytes,
    * fold digest bytes 0..5 big-endian.
    */
  def hash48(s: UTF8String): Long = {
    val md = tlMd.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
      ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
      ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  case class Md5Prefix48(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_hash48 expects a string column, got ${child.dataType}")
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      hash48(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash48.hash48($c)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "md5_hash48"
  }

  /** Register `md5_hash48` in the session registry (skipped when
    * present — re-registration WARNs per call).
    */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("md5_hash48")))
      reg.createOrReplaceTempFunction(
        "md5_hash48",
        es => {
          require(es.length == 1,
            s"md5_hash48(text) expects 1 argument, got ${es.length}")
          Md5Prefix48(es.head)
        },
        "scala_udf")
  }

  /** Column API (caller must have registered, e.g. via a table builder
    * that calls [[registerAll]] on its session).
    */
  def md5_hash48(c: Column): Column = call_function("md5_hash48", c)
}
