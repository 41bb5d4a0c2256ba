package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for training-data pipelines: source
  * mixture sampling, train/validation splits, and the deterministic
  * global shuffle that fixes a training order.
  *
  * Everything here is DETERMINISTIC BY CONSTRUCTION — selection and
  * order derive from row keys via multiplicative hashing, never from
  * `rand()` or partition layout, so a 100 TB assembly job is
  * reproducible across runs, retries and cluster sizes, and every
  * decision is auditable in plain SQL.
  */
object Mixing {

  /** Per-mille selector in [0, 1000) from a row id: Knuth
    * multiplicative hash (pre-modulus keeps the product under 2^63),
    * so clustered or sequential ids still select uniformly. Same
    * construction as TextAnalysis.stratifiedSample — and expressible
    * verbatim in ANSI SQL for auditing. */
  def mille(id: Column): Column =
    pmod(pmod(id, lit(1000003L)) * lit(2654435761L), lit(1000L))

  /** A second independent per-mille selector (different multiplier /
    * pre-modulus primes) for decisions that must not correlate with
    * `mille` — e.g. splitting after mixture sampling. */
  def mille2(id: Column): Column =
    pmod(pmod(id, lit(999983L)) * lit(2246822519L), lit(1000L))

  /** Temperature-flattened mixture sampling over a stratum column
    * (source, domain, language): stratum s with n_s rows is sampled
    * at a rate making its expected contribution ∝ n_s^temperature,
    * scaled so the largest stratum keeps `maxRate` of its rows.
    * temperature=1 preserves natural proportions; 0 equalizes all
    * strata; 0<τ<1 upsamples small sources relative to large ones —
    * the standard multilingual/domain rebalancing move.
    *
    * Scale design: stratum statistics are one partial aggregate over
    * the corpus (20-ish rows out), broadcast back; the keep decision
    * is then a map-side predicate. Rates are floored to per-mille so
    * the decision is integer-exact and SQL-auditable. */
  def mixtureSample(df: DataFrame, stratumCol: String, idCol: String,
                    temperature: Double, maxRate: Double = 1.0): DataFrame = {
    val stats = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__n"))
    // rate_s = maxRate · (n_s/n_max)^τ / (n_s/n_max)
    //        = maxRate · (n_s/n_max)^(τ−1)  — monotone ↓ in n_s
    val nMax = stats.groupBy().agg(max(col("__n")).as("__nmax"))
    val rates = stats.crossJoin(broadcast(nMax))
      .select(col(stratumCol),
        least(lit(1000),
          floor(lit(maxRate * 1000.0) *
            pow(col("__n").cast("double") / col("__nmax"),
              temperature - 1.0)).cast("int")).as("__rmille"))
    df.join(broadcast(rates), stratumCol)
      .filter(mille(col(idCol)) < col("__rmille"))
      .drop("__rmille")
  }

  /** Deterministic train/validation/test split: per-mille bands over
    * an id-hash selector. `bands` maps split name → per-mille width;
    * widths must sum to ≤ 1000 (the remainder lands in the last
    * band). Assignment is per-row stable — adding or removing OTHER
    * rows never reassigns a row. */
  def datasetSplit(df: DataFrame, idCol: String,
                   bands: Seq[(String, Int)]): DataFrame = {
    require(bands.nonEmpty && bands.map(_._2).sum <= 1000,
      "split bands must fit in 1000 per-mille slots")
    val sel = mille2(col(idCol))
    val cuts = bands.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val expr = bands.zip(cuts).init.foldLeft(
      lit(null).cast("string")) { case (acc, ((name, _), hi)) =>
      when(sel < hi && acc.isNull, lit(name)).otherwise(acc)
    }
    df.withColumn("split",
      coalesce(expr, lit(bands.last._1)))
  }

  /** Deterministic global shuffle into training shards: each row gets
    * a shard and a position, jointly a total pseudo-random order —
    * WITHOUT a global sort. The shard is a hash band (so shards are
    * balanced and hash-partitioned in one shuffle) and the in-shard
    * position a window rank over the shard alone. Ties on the hash
    * break by id, so the order is total and reproducible anywhere.
    * Returns the input plus (shard, pos). */
  def globalShuffle(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val h = pmod(pmod(col(idCol), lit(999983L)) * lit(2654435761L),
      lit(1000003L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards)).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__h")
  }

  /** Token-budget assembly: per stratum, keep the deterministic
    * hash-ordered PREFIX of rows whose cumulative `tokenCol` stays
    * within the stratum's budget — "give me 50 B tokens of web, 10 B
    * of code" as one auditable plan. The selected set is exactly
    * `cum ≤ budget` under the total order (mille, mille2, id), so
    * membership is a pure function of the corpus (rows outside the
    * stratum never change a row's fate beyond the shared order).
    *
    * Scale design — NO stratum-wide window: a per-(stratum,
    * mille-bucket) token aggregate (≤1000 partial-agged rows per
    * stratum) finds each stratum's boundary bucket; full buckets
    * below it keep map-side, and only the boundary bucket (~1/1000
    * of the stratum) pays a window to place the cut row-exactly.
    * Equivalent to the single-window formulation (the oracle runs
    * that form), but the reducer holding the biggest source sorts
    * 0.1% of it. */
  def tokenBudgetSample(df: DataFrame, stratumCol: String, idCol: String,
                        tokenCol: String,
                        budgets: Map[String, Long],
                        defaultBudget: Long = Long.MaxValue): DataFrame = {
    val budgetExpr = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (s, b)) => when(col(stratumCol) === s, lit(b)).otherwise(acc)
    }
    val withSel = df
      .withColumn("__m", mille(col(idCol)))
      .withColumn("__m2", mille2(col(idCol)))
    // phase 1: per-bucket token sums → per-stratum boundary bucket
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(col("__m"))
    val buckets = withSel.groupBy(col(stratumCol), col("__m"))
      .agg(sum(col(tokenCol)).as("__btok"))
      .withColumn("__cum", sum(col("__btok")).over(w))
      .withColumn("__budget", budgetExpr)
    // boundary = LAST bucket starting under the budget (buckets below
    // it are fully inside; its own rows face the in-bucket cut with
    // whatever budget remains before it)
    val bounds = buckets
      .filter(col("__cum") - col("__btok") < col("__budget"))
      .groupBy(col(stratumCol))
      .agg(max(col("__m")).as("__mb"))
    val boundary = buckets.select(col(stratumCol).as("__bs"),
      col("__m").as("__bm"), (col("__budget") -
        (col("__cum") - col("__btok"))).as("__rem"))
    val cut = bounds
      .join(boundary, col(stratumCol) === col("__bs") &&
        col("__mb") === col("__bm"))
      .select(col(stratumCol), col("__mb"), col("__rem"))
    // phase 2: full buckets keep map-side; boundary bucket windows
    // over its own rows only
    val tagged = withSel.join(broadcast(cut), Seq(stratumCol), "left")
    val keepFull = tagged.filter(col("__mb").isNotNull &&
      col("__m") < col("__mb"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(col("__m2"), col(idCol))
    val keepBoundary = tagged.filter(col("__m") === col("__mb"))
      .withColumn("__icum", sum(col(tokenCol)).over(wIn))
      .filter(col("__icum") <= col("__rem"))
      .drop("__icum")
    keepFull.unionByName(keepBoundary)
      .drop("__m", "__m2", "__mb", "__rem")
  }

  /** Deterministic weighted sampling without replacement by
    * SYSTEMATIC selection: rows are laid on a line in hash order,
    * each occupying an interval of its integer weight (chars,
    * tokens, bytes), and every row whose interval crosses a
    * `stride`-boundary is selected. Inclusion probability is
    * weight/stride (rows with weight ≥ stride are always taken) and
    * the expected sample size is total_weight/stride — the classic
    * PPS systematic design, but with a hash order instead of a
    * random shuffle so membership is a pure function of the corpus.
    * Integer arithmetic end to end: exact, engine-portable,
    * SQL-auditable. Returns (idCol, weightCol, cum_weight).
    *
    * Scale design — NO global window: per-mille-bucket weight sums
    * (≤1000 partial-agged rows) get exclusive prefix offsets on one
    * tiny window, broadcast back; each bucket then runs its own
    * window over ~1/1000 of the data in parallel. Identical to the
    * single-window formulation the oracle runs. */
  def weightedSystematicSample(df: DataFrame, idCol: String,
                               weightCol: String, stride: Long): DataFrame = {
    require(stride > 0, "stride must be positive")
    val withSel = df
      .withColumn("__m", mille(col(idCol)))
      .withColumn("__m2", mille2(col(idCol)))
    val wB = org.apache.spark.sql.expressions.Window
      .orderBy(col("__m"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val bases = withSel.groupBy(col("__m"))
      .agg(sum(col(weightCol)).as("__bt"))
      .withColumn("__base", coalesce(sum(col("__bt")).over(wB), lit(0L)))
      .select(col("__m"), col("__base"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__m")).orderBy(col("__m2"), col(idCol))
    withSel.join(broadcast(bases), Seq("__m"))
      .withColumn("__cum", col("__base") + sum(col(weightCol)).over(wIn))
      .filter(floor((col("__cum") - col(weightCol)) / lit(stride)) <
        floor(col("__cum") / lit(stride)))
      .select(col(idCol), col(weightCol),
        col("__cum").cast("long").as("cum_weight"))
  }

  /** Per-group quantile gate: keep rows whose `valueCol` is at or
    * above their group's q-quantile (linear-interpolation
    * percentile). The per-group cutoffs are one tiny aggregate,
    * broadcast back; the gate itself is map-side. For unbounded group
    * counts swap `percentile` for `percentile_approx` (GK sketch) —
    * same plan shape. Adds the cutoff column for auditability. */
  def quantileGate(df: DataFrame, groupCol: String, valueCol: String,
                   q: Double): DataFrame = {
    val cuts = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, $q)").as("q_cutoff"))
    df.join(broadcast(cuts), groupCol)
      .filter(col(valueCol) >= col("q_cutoff"))
  }
}
