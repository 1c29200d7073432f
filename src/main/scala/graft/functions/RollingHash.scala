package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp rolling-hash document fingerprinting (builder-prompt
  * mandate: "document fingerprinting (rolling hash)"; Karp & Rabin,
  * IBM JRD 1987). One pass per document computes the polynomial hash
  * of every k-gram of code points:
  *
  *   h(i) = Σ_{j<k} c(i+j) · B^(k-1-j)
  *
  * via the O(1)-per-position rolling recurrence
  * h(i+1) = (h(i) − c(i)·B^(k-1))·B + c(i+k) — O(n) total versus
  * O(n·k) for per-gram recomputation (what the md5-based portable
  * plans pay per gram).
  *
  * With the default B=257 > any byte, k=5: the value is EXACT signed
  * 64-bit (max code point 0x10FFFF ⇒ h < 2^53), reproducible by plain
  * BIGINT arithmetic in any SQL engine (the t18 DuckDB oracle computes
  * the same polynomial non-rolling), and INJECTIVE on ASCII k-grams —
  * for ASCII text the hash IS the gram, no collisions at all.
  *
  * Implemented as a native Catalyst `Expression` with `doGenCode`
  * (NOT a Scala UDF): the generated code calls the static kernel on
  * the raw `UTF8String` with no encoder/serialization boundary and
  * inline null handling, so it composes into whole-stage codegen.
  */
object RollingHash {

  /** Rolling k-gram hashes over the string's code points; empty when
    * the string has fewer than k code points. Hot-path kernel — called
    * from generated code, so it takes UTF8String directly.
    */
  def hashes(s: UTF8String, k: Int, base: Long): GenericArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val cps = new Array[Int](n)
    var ci = 0; var off = 0
    while (ci < n) {
      val cp = str.codePointAt(off)
      cps(ci) = cp; off += Character.charCount(cp); ci += 1
    }
    var topPow = 1L
    var j = 0
    while (j < k - 1) { topPow *= base; j += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    var i = 0
    while (i < k) { h = h * base + cps(i); i += 1 }
    out(0) = h
    while (i < n) {
      h = (h - cps(i - k) * topPow) * base + cps(i)
      out(i - k + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** `rolling_hashes(text, k, base)` as a codegen'd unary expression
    * (k and base must be foldable literals — they shape the kernel).
    */
  case class RollingHashes(child: Expression, k: Int, base: Long)
      extends UnaryExpression {
    require(k >= 1, "k must be >= 1")
    require(base >= 2, "base must be >= 2")
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_hashes expects a string column, got ${child.dataType}")
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      hashes(input.asInstanceOf[UTF8String], k, base)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.RollingHash.hashes($c, $k, ${base}L)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "rolling_hashes"
  }

  private def lit(e: Expression, what: String): Long = e match {
    case f if f.foldable =>
      f.eval(null) match {
        case i: Int => i.toLong
        case l: Long => l
        case other =>
          throw new IllegalArgumentException(s"$what must be integral, got $other")
      }
    case _ => throw new IllegalArgumentException(s"$what must be a literal")
  }

  /** Register `rolling_hashes` in the session registry. Truly
    * idempotent: skipped when already present — re-registration is a
    * SimpleFunctionRegistry WARN per call, and repeated query
    * invocation would flood the bench harness's stdout tail window.
    */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("rolling_hashes")))
      reg.createOrReplaceTempFunction(
        "rolling_hashes",
        es => {
          require(es.length == 3,
            s"rolling_hashes(text, k, base) expects 3 arguments, got " +
              s"${es.length}")
          RollingHashes(es.head, lit(es(1), "k").toInt, lit(es(2), "base"))
        },
        "scala_udf")
  }

  /** Column API. */
  def rolling_hashes(text: Column, k: Int, base: Long = 257L): Column =
    call_function("rolling_hashes", text,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(base))
}
