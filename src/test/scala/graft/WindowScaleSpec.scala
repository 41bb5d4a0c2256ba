package graft

import java.io.File

import graft.operators.{Analytics, Mixing}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Round-13 attribution of the bench-tail "Window operation! Moving
  * all data to a single partition" warning: the codebase holds
  * EXACTLY TWO unpartitioned `Window.orderBy` sites — the
  * peak-concurrency hour-carry (Analytics) and the
  * weighted-systematic-sample bucket bases (Mixing) — and both
  * execute over SUMMARY-scale inputs (one row per hour / per mille
  * bucket), never the data. A source lint pins the inventory so a
  * new global window cannot land silently; runtime tripwires read
  * the executed plan's metrics to prove the single-partition
  * exchange carried summary rows. */
class WindowScaleSpec extends SparkSpec {
  import spark.implicits._

  private def mainSources(dir: File): Seq[File] = {
    val fs = Option(dir.listFiles()).getOrElse(Array.empty)
    fs.filter(_.isDirectory).flatMap(mainSources).toSeq ++
      fs.filter(f => f.isFile && f.getName.endsWith(".scala")).toSeq
  }

  test("source lint: the unpartitioned-window inventory is exactly " +
    "the two attributed summary-scale sites") {
    val root = new File("src/main/scala/graft")
    assert(root.isDirectory, root.getAbsolutePath)
    val pat = java.util.regex.Pattern.compile("Window\\s*\\.orderBy")
    val hits = mainSources(root).flatMap { f =>
      val m = pat.matcher(java.nio.file.Files.readString(f.toPath))
      Iterator.continually(m.find()).takeWhile(identity)
        .map(_ => f.getName).toSeq
    }.groupBy(identity).view.mapValues(_.size).toMap
    assert(hits == Map("Analytics.scala" -> 1, "Mixing.scala" -> 1),
      s"unpartitioned Window.orderBy sites moved: $hits — if a new " +
        "one is intentional, prove it summary-scale here first")
  }

  /** Row counts seen by every UNPARTITIONED WindowExec in the
    * executed plan (post-AQE), via its numOutputRows metric — a
    * window preserves cardinality, so output rows == the rows that
    * crossed the single-partition exchange. */
  private def globalWindowRows(df: DataFrame): Seq[Long] = {
    df.collect()
    // AQE wraps materialized subtrees in leaf QueryStageExec nodes —
    // a plain collect never descends into them
    def deep(p: SparkPlan): Seq[WindowExec] = {
      val here = p match {
        case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
        case _                                        => Seq.empty
      }
      val nested = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      }
      here ++ (p.children ++ nested).flatMap(deep)
    }
    val windows = deep(df.queryExecution.executedPlan)
    assert(windows.nonEmpty,
      "expected an unpartitioned WindowExec in the plan")
    // WindowExec itself reports only spillSize; every node between
    // it and the next row-reporting descendant (Sort, Exchange,
    // shuffle read) preserves cardinality, so the NEAREST descendant
    // numOutputRows IS the window's input row count
    def nearestRows(p: SparkPlan): Option[Long] = {
      val kids = p.children ++ (p match {
        case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => Seq(q.plan)
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case _ => Seq.empty
      })
      kids.view.flatMap(k =>
        k.metrics.get("numOutputRows").map(_.value)
          .orElse(nearestRows(k))).headOption
    }
    windows.map(w => nearestRows(w).getOrElse(
      fail(s"no row-reporting descendant under the window:\n$w")))
  }

  test("concurrency profile: 50k spans funnel through the global " +
    "carry window as ONE ROW PER HOUR") {
    val hours = 48
    val spans = (0 until 50000).map { i =>
      val h = i % hours
      (i.toLong,
        f"2024-03-0${1 + h / 24} ${h % 24}%02d:${i % 60}%02d:00",
        60L + i % 900)
    }.toDF("id", "start_s", "dur_s")
      .select(col("id"), to_timestamp(col("start_s")).as("start_ts"),
        (unix_timestamp(to_timestamp(col("start_s"))) + col("dur_s"))
          .cast("timestamp").as("end_ts"))
    val out = Analytics.concurrencyProfile(spans, "id",
      "start_ts", "end_ts")
    val rows = globalWindowRows(out)
    // spans can END in the hour after their start: ≤ 2·hours hour
    // summaries, still summary scale vs 100k endpoints
    assert(rows.forall(_ <= 2L * hours),
      s"the carry window saw $rows rows — it must see per-hour " +
        "summaries, never endpoints")
    assert(out.count() <= 2L * hours)
  }

  test("weighted systematic sample: 20k rows funnel through the " +
    "global base window as ONE ROW PER MILLE BUCKET") {
    val df = (0 until 20000).map(i => (i.toLong, 1L + i % 7))
      .toDF("id", "w")
    val out = Mixing.weightedSystematicSample(df, "id", "w",
      stride = 100L)
    val rows = globalWindowRows(out)
    assert(rows.forall(_ <= 1000L),
      s"the bucket-base window saw $rows rows — it must see mille " +
        "buckets, never the data")
    assert(out.count() > 0)
  }
}
