package graft

import graft.sources.LogTable
import org.apache.spark.sql.functions._

/** Model-based check of the transaction-log table: a deterministic
  * pseudo-random sequence of append / delete / update / overwrite /
  * restore / optimize / cluster operations runs against BOTH the
  * real table and an in-memory multiset model; after every step the
  * loaded snapshot must equal the model, and at the end every
  * committed version must equal the model state recorded when it was
  * committed (time travel over the whole history). This is the
  * whole-protocol invariant the per-feature tests can't state:
  * arbitrary interleavings of commit kinds never lose, duplicate or
  * corrupt a row. */
class LogTableModelSpec extends SparkSpec {
  import spark.implicits._

  private type Row2 = (Long, String)

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Row2] =
    df.select("k", "v").as[Row2].collect().toSeq.sorted

  test("25 random mixed commits: table state tracks the model at " +
    "every step and every version stays exactly replayable") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_logmodel").toString
    val rnd = new scala.util.Random(42)
    val t = new LogTable(s"$dir/t", checkpointInterval = 5)

    var model = Vector.empty[Row2]
    // model state per committed version, index == log version
    var snaps = Vector.empty[Vector[Row2]]
    var nextId = 0L

    def freshBatch(): Vector[Row2] = {
      val n = 1 + rnd.nextInt(6)
      val b = (0 until n).map { _ =>
        // ~1/3 of keys collide with an earlier id to exercise
        // duplicate keys in the multiset
        val k = if (nextId > 2 && rnd.nextInt(3) == 0)
          rnd.nextLong(nextId) else { nextId += 1; nextId - 1 }
        (k, s"v${rnd.nextInt(1000)}")
      }.toVector
      b
    }

    def afterOp(): Unit = {
      val committed = t.currentVersion.map(_ + 1).getOrElse(0L)
      // every commit that happened since last check snapshots the
      // CURRENT model (ops that matched nothing commit nothing)
      while (snaps.size < committed) snaps :+= model
      assert(snaps.size == committed, s"version/snapshot drift")
      assert(sortedRows(t.load(spark)) == model.sorted,
        s"state diverged after ${snaps.size} commits")
    }

    (0 until 25).foreach { step =>
      rnd.nextInt(7) match {
        case 0 | 1 | 2 => // append (most common, as in real tables)
          val b = freshBatch()
          t.append(b.toDF("k", "v"))
          model = model ++ b
        case 3 => // range delete
          val lo = rnd.nextLong(math.max(nextId, 1L))
          val hi = lo + rnd.nextInt(5)
          if (t.exists) {
            t.delete(spark, col("k") >= lo && col("k") <= hi)
            model = model.filterNot(r => r._1 >= lo && r._1 <= hi)
          }
        case 4 => // range update
          val lo = rnd.nextLong(math.max(nextId, 1L))
          val hi = lo + rnd.nextInt(5)
          if (t.exists) {
            t.update(spark, col("k") >= lo && col("k") <= hi,
              Map("v" -> lit(s"u$step")))
            model = model.map(r =>
              if (r._1 >= lo && r._1 <= hi) (r._1, s"u$step") else r)
          }
        case 5 => // overwrite or restore, evenly
          if (snaps.nonEmpty && rnd.nextBoolean()) {
            val v = rnd.nextInt(snaps.size)
            t.restore(v.toLong)
            model = snaps(v)
          } else {
            val b = freshBatch()
            t.overwrite(b.toDF("k", "v"))
            model = b
          }
        case 6 => // maintenance: layout-only commits
          if (t.exists && t.liveAdds().size > 1) {
            if (rnd.nextBoolean()) t.compactFiles(spark)
            else t.cluster(spark, Seq("k"), nFiles = 2)
          }
      }
      afterOp()
    }

    // the full history replays: every version equals the model state
    // recorded at its commit (through checkpoints, restores and
    // layout rebuilds)
    t.versions.foreach { v =>
      assert(sortedRows(t.load(spark, Some(v))) == snaps(v.toInt).sorted,
        s"version $v no longer replays its committed state")
    }
    // sanity: the sequence actually exercised the op mix
    val ops = t.versions.map(t.commitOp).toSet
    assert(Set("append", "delete", "optimize").subsetOf(ops), ops)
  }
}
