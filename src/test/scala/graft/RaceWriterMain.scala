package graft

import org.apache.spark.sql.SparkSession

/** Subprocess body for the cross-process commit race: a SEPARATE JVM
  * (own SparkSession, own `LogTable` instance, nothing shared but
  * the filesystem) appending `n` single-row commits to a shared
  * table as fast as it can. Every append is a blind commit — the
  * optimistic retry loop must absorb every lost race; a lost UPDATE
  * or a skipped version here means the create-if-absent claim is not
  * actually atomic across processes. Prints `RACE_DONE <id> <n>` on
  * success (the spec greps for it). */
object RaceWriterMain {
  def main(args: Array[String]): Unit = {
    val Array(table, writerId, n) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-race-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t = new graft.sources.LogTable(table)
    (0 until n.toInt).foreach { i =>
      t.append(Seq((s"$writerId-$i", writerId)).toDF("id", "writer"))
    }
    println(s"RACE_DONE $writerId $n")
    spark.stop()
  }
}
