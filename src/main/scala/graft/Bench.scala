package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // keep AQE (skew handling) but don't let the 1MB partition-size
      // floor coalesce small-input/large-output stages to 1 task
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1b")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Force FULL result production: count() lets Catalyst prune
    // projections/sorts above the counted subtree, under-measuring
    // map-only queries — materializing the executed plan's row RDD
    // computes every output column of the plan as written.
    def run(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    // Warm-up: JVM/codegen/parquet-footer costs land here, not in the
    // first measured query.
    try run(SparkEntry.entry(spark)) catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      System.gc() // isolate queries from each other's garbage
      val t0 = System.nanoTime()
      try { run(fn(spark, sfDir)) } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
