package graft

import graft.operators.Mixing
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.sources.Tables.load(spark,
    "/root/testdata/sf0.01", "documents")

  test("tokenBudgetSample equals the single-window prefix formulation") {
    import org.apache.spark.sql.expressions.Window
    val budgets = Map("en" -> 20000L, "de" -> 5000L)
    val out = Mixing.tokenBudgetSample(docs, "lang", "doc_id", "n_chars",
      budgets)
    // reference: keep iff running token sum under the total order
    // (mille, mille2, id) stays within the stratum budget
    val w = Window.partitionBy(col("lang"))
      .orderBy(Mixing.mille(col("doc_id")), Mixing.mille2(col("doc_id")),
        col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budgetExpr = when(col("lang") === "en", 20000L)
      .when(col("lang") === "de", 5000L).otherwise(Long.MaxValue)
    val ref = docs.withColumn("__cum", sum(col("n_chars")).over(w))
      .filter(col("__cum") <= budgetExpr).drop("__cum")
    assert(out.count() == ref.count())
    assert(out.select("doc_id").except(ref.select("doc_id")).isEmpty &&
      ref.select("doc_id").except(out.select("doc_id")).isEmpty)
    // budgets actually bind: kept tokens within budget, next-row tight
    val keptTokens = out.groupBy("lang").agg(sum("n_chars").as("s"))
      .as[(String, Long)].collect().toMap
    assert(keptTokens("en") <= 20000L && keptTokens("de") <= 5000L)
    assert(keptTokens("en") > 15000L, "cut should land near the budget")
    // unbudgeted strata keep everything
    val frAll = docs.filter(col("lang") === "fr").count()
    assert(out.filter(col("lang") === "fr").count() == frAll)
    // zero budget drops the stratum entirely
    val none = Mixing.tokenBudgetSample(docs, "lang", "doc_id", "n_chars",
      Map("en" -> 0L))
    assert(none.filter(col("lang") === "en").count() == 0)
  }

  test("mixtureSample flattens stratum proportions toward temperature") {
    val out = Mixing.mixtureSample(docs, "lang", "doc_id",
      temperature = 0.5, maxRate = 0.8)
    val in = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val nMax = in.values.max.toDouble
    in.foreach { case (lang, n) =>
      val expectRate = math.min(1.0,
        math.floor(800.0 * math.pow(n / nMax, -0.5)) / 1000.0)
      val got = kept.getOrElse(lang, 0L).toDouble / n
      assert(math.abs(got - expectRate) < 0.12,
        s"$lang kept at $got, expected ~$expectRate")
    }
    // deterministic under repartitioning
    val out2 = Mixing.mixtureSample(docs.repartition(7), "lang", "doc_id",
      temperature = 0.5, maxRate = 0.8)
    assert(out.select("doc_id").except(out2.select("doc_id")).isEmpty)
    assert(out2.select("doc_id").except(out.select("doc_id")).isEmpty)
  }

  test("mixtureSample at temperature=1 keeps maxRate of every stratum") {
    val out = Mixing.mixtureSample(docs, "lang", "doc_id",
      temperature = 1.0, maxRate = 0.5)
    val in = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    in.foreach { case (lang, n) =>
      val got = kept.getOrElse(lang, 0L).toDouble / n
      assert(math.abs(got - 0.5) < 0.12, s"$lang kept at $got, expected ~0.5")
    }
  }

  test("datasetSplit covers every row, is per-row stable, bands sized") {
    val bands = Seq("train" -> 900, "val" -> 50, "test" -> 50)
    val out = Mixing.datasetSplit(docs, "doc_id", bands)
    assert(out.count() == docs.count())
    val byBand = out.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    val total = docs.count().toDouble
    assert(math.abs(byBand("train") / total - 0.9) < 0.05)
    assert(byBand.keySet == Set("train", "val", "test"))
    // removing other rows never reassigns a surviving row
    val sub = Mixing.datasetSplit(
      docs.filter(col("doc_id") % 3 === 0), "doc_id", bands)
    val joined = out.withColumnRenamed("split", "full_split")
      .join(sub.select(col("doc_id"), col("split").as("sub_split")), "doc_id")
    assert(joined.filter(col("full_split") =!= col("sub_split")).isEmpty)
  }

  test("globalShuffle: dense positions per shard, total deterministic order") {
    val out = Mixing.globalShuffle(docs.select("doc_id"), "doc_id", 8)
    assert(out.count() == docs.count())
    // (shard, pos) is a key: positions dense 0..n_s-1 within shard
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"),
        min(col("pos")).as("mn"))
      .as[(Int, Long, Long, Long)].collect()
    perShard.foreach { case (s, n, mx, mn) =>
      assert(mn == 0L && mx == n - 1, s"shard $s not dense")
    }
    // same order regardless of input partitioning
    val out2 = Mixing.globalShuffle(
      docs.select("doc_id").repartition(13), "doc_id", 8)
    assert(out.except(out2).isEmpty && out2.except(out).isEmpty)
    // and the order is not the input order (it shuffles)
    val firstShard = out.filter(col("shard") === 0).orderBy(col("pos"))
      .select("doc_id").as[Long].collect()
    assert(firstShard.length > 3 && !firstShard.sameElements(firstShard.sorted))
  }

  test("quantileGate keeps the upper half per group") {
    val out = Mixing.quantileGate(
      docs.select(col("doc_id"), col("lang"), col("n_chars")),
      "lang", "n_chars", 0.5)
    val in = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    in.foreach { case (lang, n) =>
      val frac = kept.getOrElse(lang, 0L).toDouble / n
      assert(frac >= 0.45 && frac <= 0.65, s"$lang kept $frac")
    }
    // nothing below its group's cutoff survives
    assert(out.filter(col("n_chars") < col("q_cutoff")).isEmpty)
  }

  test("weightedSystematicSample selects exactly one row per stride boundary") {
    val stride = 5000L
    val out = Mixing.weightedSystematicSample(docs, "doc_id", "n_chars",
      stride).cache()
    val total = docs.agg(sum(col("n_chars"))).as[Long].head()
    // every weight < stride here, so each selected interval covers
    // exactly one boundary: |sample| == floor(total/stride) exactly
    assert(docs.filter(col("n_chars") >= stride).isEmpty)
    assert(out.count() == total / stride,
      s"expected ${total / stride} boundary crossings")
    // each selected row's interval (cum-w, cum] really contains a
    // multiple of the stride
    val bad = out.filter(
      floor((col("cum_weight") - col("n_chars")) / stride) >=
        floor(col("cum_weight") / stride))
    assert(bad.isEmpty)
    // deterministic: a second run is row-identical
    val again = Mixing.weightedSystematicSample(docs, "doc_id", "n_chars",
      stride)
    assert(out.select("doc_id").except(again.select("doc_id")).isEmpty &&
      again.select("doc_id").except(out.select("doc_id")).isEmpty)
    // inclusion is weight-biased: the sampled mean weight exceeds the
    // corpus mean (PPS pulls long docs in)
    val meanAll = docs.agg(avg(col("n_chars"))).as[Double].head()
    val meanSel = out.agg(avg(col("n_chars"))).as[Double].head()
    assert(meanSel > meanAll, s"PPS mean $meanSel !> corpus mean $meanAll")
  }
}
