package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys — the manual levers for the
  * cases AQE's runtime skew-join split doesn't reach (aggregations,
  * and joins whose skew is known up front).
  *
  * All salting is DETERMINISTIC (hash-derived, never random) so
  * results are reproducible and retried tasks are idempotent.
  */
object Skew {

  /** Salted equi-join for a skewed fact against a dim that is too
    * large to broadcast: the fact side salts each row into one of
    * `salts` sub-keys by hashing `saltBy` (any column(s) with spread
    * — a unique id, or the whole row via struct), and the dim side
    * replicates each row `salts` times. A hot key's rows then land
    * on `salts` reducers instead of one. Dim shuffle volume is
    * ×salts — size `salts` to the observed skew factor, not higher.
    * Result is row-identical to the plain join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 salts: Int, saltBy: Column): DataFrame = {
    val f = fact.withColumn("__salt",
      pmod(xxhash64(saltBy), lit(salts)).cast("int"))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    f.join(d, keys :+ "__salt").drop("__salt")
  }

  /** Exact distinct count per key that survives hot keys: values are
    * salted by their OWN hash, so every occurrence of one value
    * lands in the same salt bucket — per-bucket distinct counts are
    * disjoint and their sum is the exact answer. Stage 1 spreads a
    * hot key over `salts` reducers; stage 2 merges `salts` tiny
    * rows per key. (Spark's count_distinct expands unsalted: every
    * row of a hot key converges on one reducer.) */
  def skewedDistinctCount(df: DataFrame, keys: Seq[String],
                          valueCol: String, salts: Int = 64): DataFrame = {
    val keyCols = keys.map(col)
    df.groupBy(keyCols :+ pmod(xxhash64(col(valueCol)), lit(salts))
        .as("__salt"): _*)
      .agg(count_distinct(col(valueCol)).as("__partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__partial")).as("n_distinct"))
  }
}
