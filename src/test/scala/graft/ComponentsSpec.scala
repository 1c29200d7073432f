package graft

import org.apache.spark.sql.functions._
import graft.operators.Components
import graft.queries.TextOps

/** Connected components + transitive dedup: chains collapse into one
  * component even when endpoints don't pair directly (where the greedy
  * pair-drop policy of t11 under-merges).
  */
class ComponentsSpec extends SparkSpec {

  test("chain + triangle + isolated edge resolve to correct components") {
    import spark.implicits._
    // components: {1,2,3,4} chain, {10,11,12} triangle, {20,21} pair
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (11L, 12L), (10L, 12L), (20L, 21L)).toDF("d1", "d2")
    val comp = Components.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L))
    assert(Seq(20L, 21L).forall(comp(_) == 20L))
  }

  test("transitive dedup: A~B~C chain keeps only A (greedy would too, " +
      "but via different reasoning); star keeps center-min") {
    import spark.implicits._
    val docs = (1L to 8L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    // 1~2~3 chain; 5~7, 6~7 star (min 5); 4, 8 untouched
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 7L), (6L, 7L))
      .toDF("d1", "d2")
    val kept = Components.transitiveKeepList(docs, edges)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L, 5L, 8L), s"got $kept")
    // note: greedy drop-higher-of-each-pair would also drop 6 here only
    // because 6 pairs with 7; with edges (5,6),(6,7) greedy keeps 5 AND
    // drops 6,7 — same; but with chain (5,6),(6,7) where 5!~7, greedy
    // re-examination shows transitive still keeps exactly one of {5,6,7}
  }

  test("sum-invariant convergence: a long chain (diameter ≫ 2) still " +
      "collapses to one component — the early exit cannot stop while " +
      "any label is still moving") {
    import spark.implicits._
    // a 12-node path needs several propagation rounds; a convergence
    // check that exits one round early would leave the tail nodes
    // labeled with an intermediate (non-min) id
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("d1", "d2")
    val comp = Components.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 12L).forall(comp(_) == 1L), s"got $comp")
    // and an empty edge set converges immediately to an empty label set
    val empty = Components.connectedComponents(
      Seq.empty[(Long, Long)].toDF("d1", "d2"))
    assert(empty.count() == 0L)
  }

  test("real corpus: minhash pairs → transitive groups ⊆ greedy drops") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val pairs = TextOps.minHashPairs(docs, 0.5).select("d1", "d2")
    val transitiveKept = Components.transitiveKeepList(docs, pairs)
      .count()
    val total = docs.count()
    val paired = pairs.select(col("d1").as("id"))
      .union(pairs.select(col("d2").as("id"))).distinct().count()
    // every component keeps exactly one doc: kept = total - paired + components
    assert(transitiveKept <= total)
    assert(transitiveKept >= total - paired + 1 || paired == 0)
  }
}
