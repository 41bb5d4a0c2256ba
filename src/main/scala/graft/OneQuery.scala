package graft

import org.apache.spark.sql.SparkSession

/** Timing harness for one query: `runMain graft.OneQuery <name> [sfDir]
  * [reps]` — warms at sf0.001 (JIT/codegen), then measures `reps`
  * full-result runs at the target SF. For A/B plan iteration without
  * paying the whole Bench suite. */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1b")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    def run(dir: String): Long = fn(spark, dir).queryExecution.toRdd.count()
    val warmDir = sfDir.replaceAll("sf[0-9.]+$", "sf0.001")
    if (warmDir != sfDir) { run(warmDir); () }
    spark.sharedState.cacheManager.clearCache()
    val times = (1 to reps).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      val rows = run(sfDir)
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      println(f"$name: $dt%.3f s ($rows rows)")
      dt
    }
    println(f"median ${times.sorted.apply(times.length / 2)}%.3f s")
    spark.stop()
  }
}
