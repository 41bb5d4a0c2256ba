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
    val spark = vertices.sparkSession
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(eager = true)
    var labels = vertices.select(col("id"), col("id").as("lbl"))
      .localCheckpoint(eager = true)
    // Size the loop's shuffles to the graph, not the session default:
    // each round is several shuffles over |E'| rows, and fixed
    // per-partition overhead dominates when the dup graph is far
    // smaller than the corpus (the common case).
    val edgeCount = sym.count()
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, edgeCount / 100000 + 1))
    var iter = 0
    var converged = false
    def runLoop(): Unit = while (iter < maxIter && !converged) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("lbl")).as("nlbl"))
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"),
          (col("nlbl").isNotNull && col("nlbl") < col("lbl")).as("__chg"))
      // pointer jumping: lbl ← lbl(lbl). Labels are themselves vertex
      // ids, so one self-join halves the remaining path length each
      // round — convergence in O(log diameter) instead of O(diameter).
      // (only one jump per round: jump(df) references df twice, so
      // nesting jumps without a checkpoint between them makes the
      // uncheckpointed subplan grow 4× per extra jump)
      val jumped = updated.as("a")
        .join(updated.select(col("id").as("lbl"),
          col("lbl").as("lbl2")).as("b"), Seq("lbl"), "left")
        .select(col("a.id").as("id"),
          coalesce(col("b.lbl2"), col("lbl")).as("lbl"),
          col("a.__chg").as("__chg"))
      val next = jumped.localCheckpoint(eager = true)
      converged = next.filter(col("__chg")).isEmpty
      labels = next.select(col("id"), col("lbl"))
      iter += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[cc] iter $iter converged=$converged " +
          s"t=${System.nanoTime() / 1e9}")
    }
    val oldShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try runLoop()
    finally spark.conf.set("spark.sql.shuffle.partitions", oldShuffle)
    labels.withColumnRenamed("lbl", "cluster_id")
  }

  /** Duplicate clusters from a near-dup pair set: cluster ids plus
    * the per-cluster representative choice (min id survives).
    *
    * The propagation loop runs only over edge-touched vertices —
    * near-dup pairs are a vanishing fraction of a 100 TB corpus, so
    * iterating over every document would shuffle the whole id set
    * per round for nothing. Singletons are joined back at the end
    * as their own cluster. */
  def dupClusters(ids: DataFrame, idCol: String,
                  pairs: DataFrame): DataFrame = {
    val e = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    val touched = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val cc = connectedComponents(touched, e)
    ids.select(col(idCol).as("id"))
      .join(cc, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("cluster_id"), col("id")).as("cluster_id"),
        (col("id") === coalesce(col("cluster_id"), col("id")))
          .as("is_representative"))
  }
}
