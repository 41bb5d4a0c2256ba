package graft

import java.io.File

import graft.sources.{DeltaExport, IcebergExport, LogTable}
import org.apache.spark.sql.functions._

/** The interop GRAND TOUR: one dataset crossing every format
  * boundary this library speaks — graft → Delta mirror → graft
  * (convert) → Iceberg metadata → graft (convert) — with live DML at
  * every stop and row-set equality throughout. Each hop exercises a
  * different seam: Delta export from a graft manifest, Delta
  * checkpoint fold into a by-reference commit, Iceberg export FROM a
  * converted (addsRef-manifest) table, and the Iceberg manifest fold
  * back. If any format rendering and its inverse disagree — stats
  * encodings, partition values, path escaping — the tour breaks. */
class InteropTourSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_tour").toString

  private def rm(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
  }

  test("graft → Delta → graft → Iceberg → graft: rows survive every " +
    "hop, each converted table takes DML, skipping stays live") {
    val dir = s"${tmp()}/t"
    val t0 = new LogTable(dir)
    t0.create(org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, name STRING, seg STRING"), partitionBy = Seq("seg"))
    t0.append(Seq((1L, "a", "x"), (2L, "b", "x"),
      (3L, "c", "y"), (4L, "d", "y")).toDF("k", "name", "seg"))
    t0.delete(spark, col("k") === 4L) // CoW delete pre-export

    // hop 1: graft → Delta
    DeltaExport.exportDeltaLog(spark, t0)
    rm(new File(dir, "_log"))

    // hop 2: Delta → graft (by-reference convert), with DML
    val t1 = DeltaExport.convertFromDelta(spark, dir)
    assert(t1.load(spark).select("k").as[Long].collect().toSet ==
      Set(1L, 2L, 3L))
    t1.append(Seq((5L, "e", "y")).toDF("k", "name", "seg"))
    t1.delete(spark, col("k") === 1L)
    // stats survive the Delta hop: a selective predicate prunes
    val (s1, n1) = t1.prunedAddsFor(spark, col("seg") === "y")
    assert(s1.size < n1, s"no skipping after Delta hop: ${s1.size}/$n1")

    // hop 3: graft (converted, addsRef manifest) → Iceberg
    IcebergExport.exportIcebergMetadata(spark, t1)
    rm(new File(dir, "_log"))

    // hop 4: Iceberg → graft, with DML
    val t2 = IcebergExport.convertFromIceberg(spark, dir)
    assert(t2.load(spark).select("k").as[Long].collect().toSet ==
      Set(2L, 3L, 5L), "rows lost crossing the Iceberg hop")
    val (s2, n2) = t2.prunedAddsFor(spark, col("seg") === "x")
    assert(s2.size < n2,
      s"no skipping after Iceberg hop: ${s2.size}/$n2")
    t2.append(Seq((6L, "f", "x")).toDF("k", "name", "seg"))
    t2.delete(spark, col("k") === 2L)
    assert(t2.load(spark).select("k").as[Long].collect().toSet ==
      Set(3L, 5L, 6L))
    assert(t2.commitOp(1L) == "convert")
  }
}
