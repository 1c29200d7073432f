package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list via iterative min-label
  * propagation (the scalable alternative to union-find for duplicate
  * *groups*: near-duplication is transitive through chains A≈B≈C even
  * when A and C don't pair directly).
  *
  * Each iteration is one join + one aggregation, both keyed shuffles;
  * lineage is cut with localCheckpoint so plans stay bounded. Converges
  * in O(graph diameter) iterations — near-dup graphs are shallow
  * (small clusters), so a handful in practice.
  */
object Components {

  /** @param edges two-column frame (d1, d2) of undirected edges
    * @return (node, component) where component = min node id reachable
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val bidir = edges.select(col("d1").as("src"), col("d2").as("dst"))
      .union(edges.select(col("d2").as("src"), col("d1").as("dst")))
      .distinct()
      .persist()
    var labels = bidir.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()
    // Convergence check via the label-sum invariant (r20, guide §2.4):
    // each node's label is min(own, neighbors') so labels are
    // elementwise NON-INCREASING across iterations over a FIXED node
    // set — the iteration converged iff the label sum is unchanged.
    // The sum is one tiny aggregate over the just-checkpointed labels,
    // replacing the old old-vs-new equi-join + filter + count, which
    // shuffled the full label set once more per iteration (O(nodes)
    // per round at any scale). Decimal(38,0) keeps the sum exact —
    // a wrapped Long sum could alias two different label states.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("component").cast("decimal(38,0)")))
        .head().getDecimal(0)) // null on an empty node set
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // candidate labels: own + min label among neighbors
      val viaNeighbors = bidir
        .join(labels, col("dst") === col("node"))
        .select(col("src").as("node"), col("component"))
      val next = labels.select("node", "component")
        .union(viaNeighbors)
        .groupBy("node").agg(min("component").as("component"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }
    bidir.unpersist()
    // A silent early exit would leave multiple representatives per
    // component (keep-lists would under-dedup) — surface it.
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents did not converge after $maxIter iterations" +
          " — labels may still be split; raise maxIter for graphs with" +
          " diameter > maxIter")
    labels
  }

  /** Transitive dedup keep-list: from near-dup edges over `docs`,
    * keep exactly one representative (min id) per duplicate component
    * plus every unpaired document.
    */
  def transitiveKeepList(docs: DataFrame, edges: DataFrame): DataFrame = {
    val comp = connectedComponents(edges)
    val drop = comp.filter(col("node") =!= col("component"))
      .select(col("node").as("doc_id"))
    docs.select("doc_id").distinct()
      .join(drop, Seq("doc_id"), "left_anti")
  }
}
