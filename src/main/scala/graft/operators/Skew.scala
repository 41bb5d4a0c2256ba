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

  /** Salted join that only pays for skew where it exists: a cheap
    * frequency pre-pass finds the keys above `hotThreshold`, and ONLY
    * those fact rows are salted / dim rows replicated — cold keys
    * join exactly as a plain shuffle join, so dim amplification is
    * ×salts on the (by definition tiny) hot key set instead of the
    * whole table.
    *
    * The pre-pass is itself skew-immune: groupBy(count) partially
    * aggregates map-side, so a hot key contributes one row per task
    * to its shuffle, and the hot set is broadcast (heavy hitters are
    * few or they wouldn't be heavy). Result is row-identical to the
    * plain join. This is the static-plan analogue of AQE's runtime
    * skew split, usable where AQE can't reach (e.g. when the skewed
    * side feeds an aggregation pipeline, or the plan must be fixed
    * up front). */
  def adaptiveSaltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                         salts: Int, saltBy: Column,
                         hotThreshold: Long): DataFrame = {
    val keyCols = keys.map(col)
    val hot = fact.groupBy(keyCols: _*).count()
      .filter(col("count") >= hotThreshold)
      .select(keyCols: _*)
    saltedJoinWithHotSet(fact, dim, keys, salts, saltBy, hot)
  }

  /** The salting half of [[adaptiveSaltedJoin]] with the hot-key set
    * supplied by the caller — for operators that already computed
    * per-key frequencies as part of their own plan (e.g. a dedup's
    * segment-frequency aggregate) and shouldn't pay a second
    * pre-pass. `hotKeys` must be exactly the `keys` columns; it is
    * broadcast (heavy hitters are few or they wouldn't be heavy).
    * Result is row-identical to the plain join. */
  def saltedJoinWithHotSet(fact: DataFrame, dim: DataFrame,
                           keys: Seq[String], salts: Int, saltBy: Column,
                           hotKeys: DataFrame): DataFrame = {
    val hot = hotKeys.select(keys.map(col): _*)
      .withColumn("__hot", lit(true))
    val f = fact.join(broadcast(hot), keys, "left")
      .withColumn("__salt",
        when(col("__hot").isNotNull,
          pmod(xxhash64(saltBy), lit(salts)).cast("int"))
          .otherwise(lit(0)))
      .drop("__hot")
    val d = dim.join(broadcast(hot), keys, "left")
      .withColumn("__salt", explode(
        when(col("__hot").isNotNull,
          sequence(lit(0), lit(salts - 1)).cast("array<int>"))
          .otherwise(array(lit(0)))))
      .drop("__hot")
    f.join(d, keys :+ "__salt").drop("__salt")
  }

  /** Pre-flight join-blowup profile: BEFORE running an equi-join,
    * predict its output size and find the keys that dominate it.
    * Each side collapses to (key, count) — two partial-aggregable
    * scans whose shuffles carry one narrow row per DISTINCT key, not
    * the data — then per-key output contributions `l_rows · r_rows`
    * rank by a TakeOrderedAndProject top-k (per-partition heads +
    * tiny merge, never a global sort). The one-row grand total
    * broadcasts back for the share column. At 100 TB this answers
    * "will this join explode, and on which keys do I salt /
    * pre-aggregate?" for the cost of two GROUP BYs. `l·r` products
    * are BIGINT: a single key with >3·10⁹ rows on BOTH sides would
    * overflow — ANSI mode (on) fails loudly rather than wrapping,
    * which for a pre-flight diagnostic is itself the answer. */
  def joinBlowupProfile(left: DataFrame, right: DataFrame,
                        leftKey: String, rightKey: String,
                        k: Int = 20): DataFrame = {
    val lc = left.groupBy(col(leftKey).as("join_key"))
      .agg(count(lit(1)).as("l_rows"))
    val rc = right.groupBy(col(rightKey).as("join_key"))
      .agg(count(lit(1)).as("r_rows"))
    val prod = lc.join(rc, "join_key")
      .withColumn("out_rows", col("l_rows") * col("r_rows"))
    val total = prod.agg(sum(col("out_rows")).as("__t"))
    prod.crossJoin(broadcast(total))
      .select(col("join_key"), col("l_rows"), col("r_rows"),
        col("out_rows"),
        round(col("out_rows").cast("double") / col("__t"), 6).as("share"))
      .orderBy(col("out_rows").desc, col("join_key"))
      .limit(k)
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
