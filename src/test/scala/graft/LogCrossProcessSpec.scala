package graft

import java.io.File
import java.util.concurrent.TimeUnit

import graft.sources.LogTable
import org.apache.spark.sql.types._

/** The optimistic-concurrency claim proven ACROSS PROCESSES: real
  * separate JVMs (own SparkSessions, own `LogTable` instances,
  * nothing shared but the filesystem) race blind appends against the
  * host JVM on one table. The POSIX hard-link claim is atomic at the
  * filesystem level, so every writer's every commit must land in its
  * own version — no lost updates, no gaps, no double-claims. This is
  * the piece a single-process thread race cannot prove: JVM-level
  * synchronization (the commitRetry loop's memory effects, file
  * locks) plays no part between processes. */
class LogCrossProcessSpec extends SparkSpec {
  import spark.implicits._

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("two external JVMs and the host race 36 blind appends; " +
    "every commit lands, versions are gapless, rows exact") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_xproc").toString
    val table = s"$dir/t"
    val perWriter = 12
    val t = new LogTable(table)
    t.create(StructType(Seq(StructField("id", StringType),
      StructField("writer", StringType))))

    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    def launch(id: String): Process = {
      val cmd: Seq[String] = Seq(javaBin, "-Xmx2g", "-cp", cp) ++ addOpens ++
        Seq("graft.RaceWriterMain", table, id, perWriter.toString)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      pb.redirectOutput(new File(dir, s"race-$id.log"))
      pb.start()
    }
    val p1 = launch("w1")
    val p2 = launch("w2")
    // the host races through its own LogTable instance meanwhile
    (0 until perWriter).foreach { i =>
      t.append(Seq((s"host-$i", "host")).toDF("id", "writer"))
    }
    assert(p1.waitFor(300, TimeUnit.SECONDS) && p1.exitValue() == 0,
      s"w1 failed:\n${scala.io.Source.fromFile(
        new File(dir, "race-w1.log")).mkString.takeRight(2000)}")
    assert(p2.waitFor(300, TimeUnit.SECONDS) && p2.exitValue() == 0,
      s"w2 failed:\n${scala.io.Source.fromFile(
        new File(dir, "race-w2.log")).mkString.takeRight(2000)}")

    // every commit claimed its own version: create + 36 appends,
    // gapless (versions are a contiguous range by construction of
    // the claim; a gap would mean a claim "succeeded" without its
    // log entry surviving)
    val vs = t.versions
    assert(vs.size == 1 + 3 * perWriter, s"got ${vs.size} versions")
    assert(vs == (0L until (1L + 3 * perWriter)),
      s"non-contiguous versions: $vs")
    // no lost updates: all 36 rows present exactly once
    val rows = t.load(spark).select("id").as[String].collect().toSeq
    assert(rows.size == 3 * perWriter)
    assert(rows.toSet.size == 3 * perWriter)
    val expected = Seq("w1", "w2", "host").flatMap(w =>
      (0 until perWriter).map(i => s"$w-$i")).map(_.replace("host-", "host-"))
    assert(rows.toSet == expected.toSet)
    // each version replays: every append op committed exactly one add
    vs.drop(1).foreach(v => assert(t.commitOp(v) == "append"))
  }
}
