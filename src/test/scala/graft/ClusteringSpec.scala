package graft

import graft.operators.Clustering
import org.apache.spark.sql.functions._

/** PageRank over weighted edge sets ([[Clustering.pageRank]]) and the
  * event-navigation wrapper. The CC / dupClusters half of Clustering
  * is covered by DedupSpec + EdgeCasesSpec + the dup_clusters oracle.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference PageRank, same simplified formula (no
    * dangling redistribution), plain double arithmetic. */
  private def refRank(edges: Seq[(Int, Int)], iters: Int): Map[Int, Double] = {
    val cnt = edges.groupBy(identity).map { case (e, g) => (e, g.size.toDouble) }
    val out = cnt.groupBy(_._1._1).map { case (s, g) => (s, g.values.sum) }
    val w = cnt.map { case ((s, d), c) => ((s, d), c / out(s)) }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toDouble
    var r = nodes.map(v => (v, 1.0 / n)).toMap
    for (_ <- 1 to iters) {
      val contrib = w.toSeq
        .map { case ((s, d), wt) => (d, r(s) * wt) }
        .groupBy(_._1).map { case (d, g) => (d, g.map(_._2).sum) }
      r = nodes.map(v => (v, 0.15 / n + 0.85 * contrib.getOrElse(v, 0.0))).toMap
    }
    r.map { case (v, x) =>
      (v, BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  private def run(edges: Seq[(Int, Int)], iters: Int = 5): Map[Int, Double] =
    Clustering.pageRank(edges.toDF("src", "dst"), iters)
      .as[(Int, Double)].collect().toMap

  test("pageRank on a symmetric ring is uniform") {
    val ring = Seq((1, 2), (2, 3), (3, 1))
    assert(run(ring) == Map(1 -> 0.333333, 2 -> 0.333333, 3 -> 0.333333))
  }

  test("pageRank matches the driver-side reference on an asymmetric graph") {
    // star into a dangling hub plus a side chain and a repeated edge
    // (repeats weight the edge, exercising the cnt/outdeg path)
    val g = Seq((2, 1), (3, 1), (3, 1), (3, 4), (4, 2), (5, 2), (1, 5), (1, 5))
    val got = run(g)
    val want = refRank(g, 5)
    assert(got.keySet == want.keySet)
    for (v <- want.keySet)
      assert(math.abs(got(v) - want(v)) <= 1e-6, s"node $v: ${got(v)} vs ${want(v)}")
  }

  test("pageRank is invariant under input partitioning") {
    val g = Seq((2, 1), (3, 1), (3, 4), (4, 2), (5, 2), (1, 5))
    val base = run(g)
    val shuffled = Clustering.pageRank(
      g.reverse.toDF("src", "dst").repartition(7), iters = 5)
      .as[(Int, Double)].collect().toMap
    assert(shuffled == base)
  }

  test("navigationRank over events: a proper distribution up to dangling leak") {
    val events = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "events")
    val ranks = Clustering.navigationRank(events, iters = 5)
      .as[(Int, Double)].collect()
    assert(ranks.nonEmpty)
    val n = ranks.length.toDouble
    // teleport floor holds for every node; total mass ≤ 1 (dangling
    // nodes leak mass in the simplified formula, never add it)
    assert(ranks.forall { case (_, r) => r >= 0.15 / n - 1e-6 })
    val total = ranks.map(_._2).sum
    assert(total <= 1.0 + 1e-4 && total > 0.5, s"total mass $total")
  }
}
