package graft.operators

import graft.functions._
import graft.plans.FloatVectorExpressions.{floatDot, floatNorm, srpBuckets}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbour search over an embedding column.
  *
  * Scale design: the brute-force path broadcasts the (small) query
  * set against the (huge) corpus — a map-only pass over the corpus,
  * then per-query top-k via partial top-k aggregation; no corpus
  * shuffle. The LSH path buckets the corpus by sign-random-projection
  * so each query only scans its bucket(s) — the 100 TB route, with
  * recall traded via number of projection bits / probes.
  */
object Similarity {

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors. Query side must be small (broadcast). Norms are
    * precomputed per vector — per-pair work is one dot product. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      floatNorm(col(vecCol)).as("__qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      floatNorm(col(vecCol)).as("__cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", floatDot(col("__qv"), col("__cv")) /
        (col("__qn") * col("__cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Multi-table LSH (sign-random-projection) bucketed ANN: the
    * corpus is bucketed into `tables` independent hash tables (a
    * write-time/materializable pass at scale — corpus storage ×L,
    * probe cost |bucket|·L instead of |corpus|); each query joins
    * only its bucket per table, candidates are deduped, then exact
    * cosine ranks them. Recall grows with `tables`, probe cost with
    * 2^-bits — measured against bruteForceTopK in tests. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              bits: Int = 8, tables: Int = 8, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      floatNorm(col(vecCol)).as("__cn"))
      .select(col("*"), posexplode(srpBuckets(col("__cv"), bits, tables))
        .as(Seq("t", "b")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      floatNorm(col(vecCol)).as("__qn"))
      .select(col("*"), posexplode(srpBuckets(col("__qv"), bits, tables))
        .as(Seq("t", "b")))
    val cands = c.join(broadcast(q), Seq("t", "b"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        col("__qv"), col("__cv"), col("__qn"), col("__cn"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    cands
      .withColumn("cos", floatDot(col("__qv"), col("__cv")) /
        (col("__qn") * col("__cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }
}
