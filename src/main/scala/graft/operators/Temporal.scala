package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins. */
object Temporal {

  /** As-of (point-in-time) left join: for every left row, attach the
    * latest right row with the same key and `rightTs <= leftTs`.
    *
    * Implemented as the union-merge algorithm, not a join: both
    * sides are tagged and unioned, one window per key ordered by
    * (time, tag, attrs) carries the most recent right state forward
    * (`last_value ignoreNulls`), and left rows are then filtered
    * back out. One hash-partitioned shuffle on the key, zero row
    * amplification — a key×key equi-join with a time filter would
    * produce |left|·|right-per-key| intermediate rows and a top-1
    * window over them, which is quadratic per key at scale.
    *
    * Right rows sharing (key, ts) tie-break by the struct order of
    * `rightAttrs` (greatest wins), so list the tie-break column
    * first. */
  def asOfJoin(left: DataFrame, leftKey: String, leftTs: String,
               right: DataFrame, rightKey: String, rightTs: String,
               rightAttrs: Seq[String]): DataFrame =
    asOfJoinDirected(left, leftKey, leftTs, right, rightKey, rightTs,
      rightAttrs, forward = false, toleranceSeconds = -1L)

  /** As-of join with direction and tolerance — still the union-merge
    * single-shuffle plan:
    *
    *  - `forward = false`: latest right row with rightTs <= leftTs
    *    (the classic backward as-of);
    *  - `forward = true`: EARLIEST right row with rightTs >= leftTs
    *    ("what happened next") — same merge, run over negated time;
    *  - `toleranceSeconds >= 0`: matches further than the tolerance
    *    from the left timestamp are nulled out (the match is kept
    *    left-outer, like pandas merge_asof's tolerance).
    */
  def asOfJoinDirected(left: DataFrame, leftKey: String, leftTs: String,
                       right: DataFrame, rightKey: String, rightTs: String,
                       rightAttrs: Seq[String], forward: Boolean,
                       toleranceSeconds: Long = -1L): DataFrame = {
    val leftCols = left.columns
    // micros epoch for ordering/tolerance; the cast normalizes
    // TIMESTAMP_NTZ inputs (session tz is UTC) — unix_micros alone
    // rejects NTZ
    def usOf(c: Column) = unix_micros(c.cast("timestamp"))
    // the matched right timestamp rides along (field 0) so tolerance
    // can compare it; equal-ts ties still break on the attr fields
    val rstruct = struct((usOf(col(rightTs)).as("__rts") +:
      rightAttrs.map(col)): _*)
    val r = right.select(col(rightKey).as("__k"),
      usOf(col(rightTs)).as("__us"), lit(0).as("__tag"),
      rstruct.as("__r"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        left.schema.fields)).as("__l"))
    val l = left.select(col(leftKey).as("__k"),
      usOf(col(leftTs)).as("__us"), lit(1).as("__tag"),
      lit(null).cast(r.schema("__r").dataType).as("__r"),
      struct(leftCols.map(col): _*).as("__l"))
    val ord = if (forward) -col("__us") else col("__us")
    val w = Window.partitionBy("__k")
      .orderBy(ord, col("__tag"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gap = abs(col("__us") - col("__last.__rts"))
    val withinTol =
      if (toleranceSeconds < 0) col("__last").isNotNull
      else col("__last").isNotNull && gap <= toleranceSeconds * 1000000L
    r.unionByName(l)
      .withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightAttrs.map(a =>
          when(withinTol, col(s"__last.$a")).otherwise(lit(null)).as(a)): _*)
  }

  /** Point-in-interval (range) join: enrich each fact with the
    * dimension version whose `[validFrom, validTo)` interval covers
    * the fact's timestamp — the SCD2 lookup.
    *
    * Formulated as a key equi-join with the range predicate as join
    * condition: Catalyst plans a hash join on the key and evaluates
    * the range residually, so row amplification is bounded by
    * versions-per-key (small by construction for SCD dims), never
    * |facts|×|dim|. An open `validTo` (null) matches everything from
    * `validFrom` on. Inner by default; `leftOuter = true` keeps
    * unmatched facts with null dim attrs. */
  def intervalJoin(facts: DataFrame, factKey: String, factTs: String,
                   dim: DataFrame, dimKey: String,
                   validFrom: String = "valid_from",
                   validTo: String = "valid_to",
                   leftOuter: Boolean = false): DataFrame = {
    // Alias every dim column before building the condition: when both
    // sides derive from the same lineage (the common SCD2-from-history
    // case), `facts(k) === dim(k)` leans on Spark's dataset-id
    // disambiguation and logs "trivially true equals predicate" — and
    // breaks silently if either side is transformed first. Prefixed
    // names make the condition unambiguous by construction.
    val p = "__dim_"
    val d = dim.select(dim.columns.map(c => col(c).as(p + c)): _*)
    val cond = facts(factKey) === d(p + dimKey) &&
      facts(factTs) >= d(p + validFrom) &&
      (d(p + validTo).isNull || facts(factTs) < d(p + validTo))
    facts.join(d, cond, if (leftOuter) "left" else "inner")
      .select(facts.columns.map(facts(_)) ++
        dim.columns.filter(_ != dimKey).map(c => col(p + c).as(c)): _*)
  }

  /** Densify a per-key hourly event series — one row for EVERY hour
    * from the key's first to its last event hour, absent hours at
    * count 0. A plain groupBy silently skips empty buckets, which
    * poisons any rate model, anomaly detector or moving window
    * consuming the series. The hour grid is generated per key from
    * ONE aggregate (`sequence` explode — output ∝ span hours, never
    * table size) and hash-joined back on (key, hour); both shuffles
    * are key-bounded, nothing global. */
  def gapFillCounts(events: DataFrame, keyCol: String = "user_id",
                    tsCol: String = "ts"): DataFrame = {
    val hourly = events.groupBy(col(keyCol),
      date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val grid = hourly.groupBy(col(keyCol))
      .agg(min("hour").as("__h0"), max("hour").as("__h1"))
      .select(col(keyCol), explode(sequence(col("__h0"), col("__h1"),
        expr("INTERVAL 1 HOUR"))).as("hour"))
    grid.join(hourly, Seq(keyCol, "hour"), "left")
      .select(col(keyCol), col("hour"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Gap-fill a VALUE series with last-observation-carried-forward:
    * per-key hourly mean of `valueCol` (decimal-exact sum over
    * count, so the result is partition-order-invariant), missing
    * hours carrying the latest observed hour's value forward — no
    * look-ahead, the streaming-safe fill. Leading gaps (before the
    * first observation) stay null by construction of the span. */
  def locfFill(events: DataFrame, keyCol: String, tsCol: String,
               valueCol: String): DataFrame = {
    val hourly = events.groupBy(col(keyCol),
      date_trunc("hour", col(tsCol)).as("hour"))
      .agg((sum(col(valueCol).cast("decimal(28,6)")).cast("double") /
        count(lit(1))).as("v_obs"))
    val grid = hourly.groupBy(col(keyCol))
      .agg(min("hour").as("__h0"), max("hour").as("__h1"))
      .select(col(keyCol), explode(sequence(col("__h0"), col("__h1"),
        expr("INTERVAL 1 HOUR"))).as("hour"))
    val w = Window.partitionBy(keyCol).orderBy("hour")
    grid.join(hourly, Seq(keyCol, "hour"), "left")
      .withColumn("v", last("v_obs", ignoreNulls = true).over(w))
      .drop("v_obs")
  }
}
