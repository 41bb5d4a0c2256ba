package graft.operators

import graft.plans.FloatVectorExpressions.{floatDot, floatNorm, srpBuckets}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN indexes: the build/probe split [[Similarity]]'s
  * in-memory paths amortize away. `lshTopK`/`ivfTopK` re-bucket the
  * corpus on every call — correct, but at 100 TB the bucketing pass
  * IS the expensive part (a full corpus scan + centroid assignment or
  * L-table explode). Real vector stores build the index ONCE at write
  * time and serve many query batches from it; these builders do the
  * same with plain partitioned parquet:
  *
  *  - IVF: one corpus pass assigns each vector to its Voronoi cell,
  *    the cells land as `cid=<n>/` partitions (norms precomputed),
  *    the centroid matrix (model state, nlist × dims) sits beside
  *    them. A probe reads ONLY the cells its queries hit — Spark's
  *    dynamic partition pruning through the broadcast cell join, or
  *    at worst a full scan WITHOUT any re-hash — and never runs the
  *    assignment kernel over the corpus again.
  *  - LSH: the multi-table explode lands as `t=<i>/b=<j>/`
  *    partitions (storage ×tables, the documented LSH trade); probes
  *    prune to the |queries|·tables buckets they actually hit.
  *
  * Rebuild-on-drift, not in-place update: like the zorder/manifest
  * ops, the index is an immutable layout artifact — recompute it when
  * the corpus changes enough for recall to sag (or rebuild per
  * partition of an incrementally-loaded corpus). */
object AnnIndex {

  /** Train centroids, assign every corpus vector to its cell, and
    * write the index: `cells/` partitioned by `cid` (one shuffle to
    * co-locate each cell's vectors into its own files — the layout
    * probes prune on), `centroids/` as a tiny parquet beside it.
    * The one corpus-scale assignment pass happens HERE, once. */
  def buildIvf(corpus: DataFrame, path: String, nlist: Int = 64,
               iters: Int = 3, idCol: String = "vec_id",
               vecCol: String = "embedding",
               sampleFraction: Double = 1.0): Unit = {
    val spark = corpus.sparkSession
    val cents = Similarity.trainIvfCentroids(corpus, nlist, iters, idCol,
      vecCol, sampleFraction)
    import spark.implicits._
    cents.zipWithIndex.map { case (v, i) => (i, v) }.toDF("cid", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"),
      floatNorm(col(vecCol)).as("norm"),
      graft.plans.IvfExpressions.topCentroids(col(vecCol), cents, 1)(0)
        .cast("int").as("cid"))
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/cells")
  }

  /** The persisted centroid matrix (model state — nlist × dims). */
  def loadIvfCentroids(spark: SparkSession, path: String): Seq[Seq[Float]] =
    spark.read.parquet(s"$path/centroids").orderBy(col("cid"))
      .collect().map(_.getSeq[Float](1).toSeq).toSeq

  /** Probe a persisted IVF index: the centroid kernel runs over the
    * QUERY side only (|queries| × nprobe cells); the corpus side is a
    * plain partitioned-parquet scan joined on the partition column —
    * no re-assignment, no re-hash, and partition pruning through the
    * broadcast join trims the scan to the probed cells. */
  def ivfProbe(spark: SparkSession, path: String, queries: DataFrame,
               k: Int, nprobe: Int = 8, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val cents = loadIvfCentroids(spark, path)
    val cells = spark.read.parquet(s"$path/cells")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      floatNorm(col(vecCol)).as("__qn"),
      explode(graft.plans.IvfExpressions.topCentroids(col(vecCol), cents,
        nprobe)).as("cid"))
    rankTopK(cells.join(broadcast(q), Seq("cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", floatDot(col("__qv"), col("embedding")) /
        (col("__qn") * col("norm")))
      .withColumnRenamed("vec_id", "neighbor_id"), k)
  }

  /** Write the multi-table LSH index: each vector explodes into its
    * (table, bucket) memberships, landed as `t=/b=/` partitions with
    * norms precomputed — the ×tables storage the in-memory path pays
    * in CPU on every call, paid once here. */
  def buildLsh(corpus: DataFrame, path: String, bits: Int = 8,
               tables: Int = 8, idCol: String = "vec_id",
               vecCol: String = "embedding"): Unit =
    corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"),
      floatNorm(col(vecCol)).as("norm"))
      .select(col("*"), posexplode(srpBuckets(col("embedding"), bits, tables))
        .as(Seq("t", "b")))
      .repartition(col("t"), col("b"))
      .write.mode("overwrite").partitionBy("t", "b").parquet(s"$path/buckets")

  /** Probe a persisted LSH index (bits/tables ride in the stored
    * layout; the query side must hash with the SAME bits/tables —
    * srpBuckets is deterministic, so matching parameters reproduce
    * the build-time projections exactly). */
  def lshProbe(spark: SparkSession, path: String, queries: DataFrame,
               k: Int, bits: Int = 8, tables: Int = 8,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val buckets = spark.read.parquet(s"$path/buckets")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      floatNorm(col(vecCol)).as("__qn"))
      .select(col("*"), posexplode(srpBuckets(col("__qv"), bits, tables))
        .as(Seq("t", "b")))
    val cands = buckets.join(broadcast(q), Seq("t", "b"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("__qv"), col("embedding"), col("__qn"), col("norm"))
      .dropDuplicates("query_id", "neighbor_id")
    rankTopK(cands.withColumn("cos", floatDot(col("__qv"), col("embedding")) /
      (col("__qn") * col("norm"))), k)
  }

  /** Same bounded-heap per-query top-k as [[Similarity]]'s (kept
    * private there; duplicated signature, shared aggregate kernel). */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(graft.plans.TopKPairsAggregate
        .topKPairs(col("cos"), col("neighbor_id"), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__p", "nb")))
      .select(col("query_id"), (col("__p") + 1).cast("long").as("rank"),
        col("nb.neighbor_id").as("neighbor_id"),
        round(col("nb.cos"), 6).as("cosine"))
}
