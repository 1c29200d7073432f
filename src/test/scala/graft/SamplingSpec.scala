package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic sampling: layout-independence is the whole point —
  * the same rows must be selected at any partition count.
  */
class SamplingSpec extends SparkSpec {

  test("hashSample selects identical rows at different partition counts") {
    val docs = Tables.documents(spark, sf)
    val a = Sampling.hashSample(docs.repartition(2), col("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.hashSample(docs.repartition(13), col("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b), "sample must not depend on layout")
    val frac = a.length.toDouble / docs.count()
    assert(frac > 0.2 && frac < 0.4, s"fraction off: $frac")
  }

  test("portableBucket is layout-independent and roughly uniform") {
    val docs = Tables.documents(spark, sf)
    def buckets(parts: Int) = docs.repartition(parts)
      .select(col("doc_id"),
        Sampling.portableBucket(col("doc_id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = buckets(2); val b = buckets(13)
    assert(a === b, "bucket must not depend on layout")
    val below = a.values.count(_ < 800000).toDouble / a.size
    assert(below > 0.7 && below < 0.9, s"800k threshold share: $below")
  }

  test("stratified fractions hold per stratum") {
    val docs = Tables.documents(spark, sf)
    val sampled = Sampling.stratifiedHashSample(docs, col("lang"),
      col("doc_id"), Map("en" -> 0.8, "zh" -> 0.1), 0.5)
    val rates = sampled.groupBy("lang").count()
      .join(docs.groupBy("lang").count()
        .withColumnRenamed("count", "total"), "lang")
      .select(col("lang"), (col("count") / col("total")).as("rate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(rates("en") - 0.8) < 0.15)
    assert(rates("zh") < 0.3)
  }

  test("train/val/test split is exhaustive, disjoint, and stable") {
    val docs = Tables.documents(spark, sf)
      .withColumn("split",
        Sampling.splitColumn(col("doc_id"), 0.7, 0.2))
    val counts = docs.groupBy("split").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set(0, 1, 2)))
    assert(counts.values.sum === docs.count())
    val again = Tables.documents(spark, sf).repartition(7)
      .withColumn("split",
        Sampling.splitColumn(col("doc_id"), 0.7, 0.2))
      .groupBy("split").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(again === counts)
  }
}
