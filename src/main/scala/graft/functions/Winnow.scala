package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Winnowing window-minimum selection (Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD'03) over a per-document gram-hash sequence: every window of
  * `w` consecutive hashes contributes its minimum, and the fingerprint
  * set is the distinct selected VALUES (tie position never changes the
  * selected value, so no tie-break is needed).
  *
  * The kernel is the O(n) monotonic-deque sliding minimum — each index
  * enters and leaves the deque once — versus the O(n·w·log) per-doc
  * window sort a relational min-over-frame plan pays. Composed with
  * [[RollingHash]] (O(n) gram hashing vs O(n·k) per-gram digests) the
  * whole fingerprint pipeline is one linear pass per document, entirely
  * inside whole-stage codegen: this is t08's declared plan, while the
  * positional-explode + window-function form stays the DuckDB oracle
  * twin (the same declared-kernel / portable-twin split t18 made).
  *
  * Only FULL windows select (sequences shorter than `w` fingerprint to
  * empty) — matching the SQL twin's `ROWS BETWEEN CURRENT ROW AND w-1
  * FOLLOWING ... WHERE p <= n_grams - (w-1)` frame exactly.
  */
object Winnow {

  /** Distinct window-of-`w` minima of the hash sequence, ascending.
    * Hot-path kernel — called from generated code on the raw ArrayData.
    */
  def mins(hs: ArrayData, w: Int): GenericArrayData = {
    val n = hs.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val arr = hs.toLongArray()
    val picked = new java.util.TreeSet[java.lang.Long]()
    // monotonic deque of indices; front = window min, ties keep rightmost
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    var i = 0
    while (i < n) {
      while (tail > head && arr(deque(tail - 1)) >= arr(i)) tail -= 1
      deque(tail) = i; tail += 1
      val start = i - w + 1
      if (start >= 0) {
        while (deque(head) < start) head += 1
        picked.add(arr(deque(head)))
      }
      i += 1
    }
    val out = new Array[Long](picked.size)
    val it = picked.iterator()
    var z = 0
    while (it.hasNext) { out(z) = it.next(); z += 1 }
    new GenericArrayData(out)
  }

  /** `winnow_mins(hashes, w)` as a codegen'd unary expression (`w` must
    * be a foldable literal — it shapes the kernel).
    */
  case class WinnowMins(child: Expression, w: Int)
      extends UnaryExpression {
    require(w >= 1, "w must be >= 1")
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        // containsNull must be false: mins() calls toLongArray(), which
        // on UnsafeArrayData with null elements reads garbage silently.
        // The only producer (rolling_hashes) already guarantees it.
        case ArrayType(LongType, false) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult
            .TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult
            .TypeCheckFailure(
              s"winnow_mins expects array<bigint> with non-null " +
                s"elements, got $other")
      }
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      mins(input.asInstanceOf[ArrayData], w)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Winnow.mins($c, $w)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "winnow_mins"
  }

  private def litInt(e: Expression, what: String): Int = e match {
    case f if f.foldable =>
      f.eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case other =>
          throw new IllegalArgumentException(
            s"$what must be integral, got $other")
      }
    case _ => throw new IllegalArgumentException(s"$what must be a literal")
  }

  /** Register `winnow_mins` in the session registry. Truly idempotent:
    * skipped when already present (re-registration WARNs per call).
    */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_mins")))
      reg.createOrReplaceTempFunction(
        "winnow_mins",
        es => {
          require(es.length == 2,
            s"winnow_mins(hashes, w) expects 2 arguments, got ${es.length}")
          WinnowMins(es.head, litInt(es(1), "w"))
        },
        "scala_udf")
  }

  /** Column API. */
  def winnow_mins(hashes: Column, w: Int): Column =
    call_function("winnow_mins", hashes,
      org.apache.spark.sql.functions.lit(w))
}
