package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling operators (builder prompt: "salting for skew"; SURVEY
  * §4 spill/shuffle row). AQE's skew-join split handles sort-merge
  * joins adaptively; these utilities cover the two cases AQE doesn't:
  * skewed AGGREGATION keys, and broadcast-replicated salted joins you
  * want planned statically.
  */
object Skew {

  /** Algebraic aggregate spec understood by the two-phase rewrite:
    * partial(func) then merge(func) — sum/count/min/max re-merge with
    * (sum, sum, min, max) respectively.
    */
  case class AggSpec(func: String, column: String, alias: String) {
    require(Set("sum", "count", "min", "max")(func),
      s"non-algebraic aggregate $func can't be salted two-phase")
  }

  private def partialCol(a: AggSpec): Column = a.func match {
    case "sum" => sum(col(a.column)).as(a.alias)
    case "count" => count(col(a.column)).as(a.alias)
    case "min" => min(col(a.column)).as(a.alias)
    case "max" => max(col(a.column)).as(a.alias)
  }

  private def mergeCol(a: AggSpec): Column = a.func match {
    case "sum" | "count" => sum(col(a.alias)).as(a.alias)
    case "min" => min(col(a.alias)).as(a.alias)
    case "max" => max(col(a.alias)).as(a.alias)
  }

  /** Two-phase salted aggregation: groupBy(keys + salt) then
    * groupBy(keys). A key owning 90% of all rows becomes `buckets`
    * evenly-sized partial groups in phase 1, so no single reducer owns
    * the hot key. Salt is derived from a hash of the whole row —
    * deterministic, and spreads a hot key as long as payloads differ.
    *
    * (Spark's own partial aggregation covers this when the map-side
    * combine is effective; explicit salting is for high-cardinality
    * payload aggs — e.g. collect-like or countDistinct pre-bucketing —
    * and for forcing even reducers under extreme skew.)
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], buckets: Int,
      aggs: Seq[AggSpec]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(buckets)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialCol(aggs.head), aggs.tail.map(partialCol): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(mergeCol(aggs.head), aggs.tail.map(mergeCol): _*)
  }

  /** Salted equi-join for a skewed LEFT side against a small-ish right
    * side that is too large to broadcast outright but small enough to
    * replicate `buckets`×: left rows get a row-hash salt, right rows are
    * exploded once per salt value, and the join key becomes
    * (key, salt) — splitting a hot key's rows across `buckets` tasks.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(left.columns.toIndexedSeq.map(col): _*), lit(buckets)))
    val explodedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(explodedRight, Seq(key, "__salt"))
      .drop("__salt")
  }
}
