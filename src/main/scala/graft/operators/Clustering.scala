package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph clustering over near-duplicate pair sets: turning pairwise
  * "A ~ B" edges into duplicate CLUSTERS (keep one representative
  * per cluster) — the step after any Dedup.* pair generator in a
  * training-data pipeline.
  */
object Clustering {

  /** Connected components by iterative min-label propagation (the
    * Pregel/GraphX formulation as DataFrame ops): every vertex
    * starts labelled with its own id; each round it adopts the
    * minimum label among itself and its neighbours, until a fixpoint.
    *
    * The driver loop is control flow only — each iteration is one
    * distributed join + aggregate, O(|E|) per round, ≤ diameter
    * rounds (near-dup clusters are shallow, so a handful). Lineage
    * is truncated per round with localCheckpoint so plans don't
    * grow unboundedly.
    *
    * @param vertices one column `id`
    * @param edges    columns `src`, `dst` (undirected; either order)
    * @return (id, cluster_id) where cluster_id = min id in component
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(eager = true)
    var labels = vertices.select(col("id"), col("id").as("lbl"))
      .localCheckpoint(eager = true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("lbl")).as("nlbl"))
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"),
          (col("nlbl").isNotNull && col("nlbl") < col("lbl")).as("__chg"))
      val next = updated.localCheckpoint(eager = true)
      converged = next.filter(col("__chg")).isEmpty
      labels = next.select(col("id"), col("lbl"))
      iter += 1
    }
    labels.withColumnRenamed("lbl", "cluster_id")
  }

  /** Duplicate clusters from a near-dup pair set: cluster ids plus
    * the per-cluster representative choice (min id survives). */
  def dupClusters(ids: DataFrame, idCol: String,
                  pairs: DataFrame): DataFrame = {
    val v = ids.select(col(idCol).as("id"))
    val e = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    connectedComponents(v, e)
      .select(col("id").as(idCol), col("cluster_id"),
        (col("id") === col("cluster_id")).as("is_representative"))
  }
}
