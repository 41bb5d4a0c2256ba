package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge-on-read versioned parquet sink: the write-amplification
  * counterpart to [[VersionedParquetSink]]'s copy-on-write commits —
  * the trade Delta's deletion vectors / Iceberg's merge-on-read make
  * to keep frequent small merges affordable on a huge dimension.
  *
  * Layout under `path`:
  *  - `v=N/`        full base snapshots (immutable, as in the CoW sink)
  *  - `patch=M/upserts/`, `patch=M/deletes/`  per-merge delta commits
  *  - `_CURRENT`    one-line manifest `N|M1,M2,...` — the base version
  *    plus the ordered patch list, swapped by atomic rename, so a
  *    reader always resolves a consistent (base, patches) pair.
  *
  * A patch commit writes ONLY the merge's change set (∝ delta, never
  * ∝ table). The reader applies patches by KEY (`keyCols` must be a
  * unique key of the dimension, and patches must not rewrite key
  * columns): latest action per key wins — an upsert replaces the
  * row, a delete-marker removes it — computed with one window over
  * the PATCH rows only (∝ accumulated delta) and one anti-join of
  * the base against the touched keys (broadcastable while the delta
  * is small — exactly the regime merge-on-read exists for). When the
  * accumulated delta stops being small, [[compact]] folds everything
  * into a new base snapshot and clears the patch list — Delta's
  * OPTIMIZE step, reusing the ordinary overwrite path. */
final class MergeOnReadSink(path: String, val keyCols: Seq[String])
  extends DimSink {
  require(keyCols.nonEmpty, "MergeOnReadSink needs at least one key column")

  private def manifest = new java.io.File(path, "_CURRENT")

  /** (base version, ordered patch ids) per the current manifest. */
  def state: Option[(Long, Seq[Long])] =
    if (!manifest.exists) None
    else {
      val line = java.nio.file.Files.readString(manifest.toPath).trim
      val Array(b, ps @ _*) = line.split('|')
      val patches = ps.headOption.filter(_.nonEmpty)
        .map(_.split(',').toSeq.map(_.toLong)).getOrElse(Seq.empty)
      Some((b.toLong, patches))
    }

  private def swapManifest(base: Long, patches: Seq[Long]): Unit = {
    val tmp = new java.io.File(path, s"_CURRENT.tmp${base}_${patches.size}")
    java.nio.file.Files.writeString(tmp.toPath,
      s"$base|${patches.mkString(",")}")
    java.nio.file.Files.move(tmp.toPath, manifest.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  private def nextId(prefix: String): Long =
    Option(new java.io.File(path).listFiles()).toSeq.flatten
      .flatMap(f => if (f.getName.startsWith(prefix))
        Some(f.getName.stripPrefix(prefix).toLong) else None)
      .maxOption.getOrElse(-1L) + 1L

  /** Full-snapshot commit: new base version, patch list cleared. */
  override def overwrite(dim: DataFrame): Unit = {
    val next = nextId("v=")
    dim.write.mode("overwrite").parquet(s"$path/v=$next")
    swapManifest(next, Seq.empty)
  }

  /** Delta commit: land the merge's upsert rows (full schema) and
    * deleted keys (key columns only), then append the patch to the
    * manifest. Write cost ∝ the change set. */
  def commitPatch(upserts: DataFrame, deleteKeys: DataFrame): Unit = {
    val (base, patches) = state.getOrElse(throw new IllegalStateException(
      "merge-on-read patch without a base snapshot — seed the sink " +
        "with overwrite() first"))
    val p = nextId("patch=")
    upserts.write.mode("overwrite").parquet(s"$path/patch=$p/upserts")
    deleteKeys.select(keyCols.map(col): _*)
      .write.mode("overwrite").parquet(s"$path/patch=$p/deletes")
    swapManifest(base, patches :+ p)
  }

  /** Current state = base ⊕ patches, resolved at read time. */
  override def load(spark: SparkSession): Option[DataFrame] =
    state.map { case (base, patches) =>
      val baseDf = spark.read.parquet(s"$path/v=$base")
      if (patches.isEmpty) baseDf
      else {
        val schema = baseDf.schema
        val dataCols = schema.map(_.name)
        // explicit schemas throughout: an empty patch (a merge that
        // only inserted, or only deleted) writes no parquet footers
        // to infer from
        val keySchema = org.apache.spark.sql.types.StructType(
          keyCols.map(schema(_)))
        def nullFilled(keysOnly: DataFrame): DataFrame =
          keysOnly.select(dataCols.map(c =>
            if (keyCols.contains(c)) col(c)
            else lit(null).cast(schema(c).dataType).as(c)): _*)
        val actions = patches.zipWithIndex.map { case (pid, i) =>
          val up = spark.read.schema(schema)
            .parquet(s"$path/patch=$pid/upserts")
            .withColumn("__seq", lit(i.toLong))
            .withColumn("__up", lit(true))
          val del = nullFilled(spark.read.schema(keySchema)
            .parquet(s"$path/patch=$pid/deletes"))
            .withColumn("__seq", lit(i.toLong))
            .withColumn("__up", lit(false))
          up.unionByName(del)
        }.reduce(_.unionByName(_))
        // latest action per key wins; an upsert beats a delete-marker
        // from the same patch (a merge's REPLACED key emits both)
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("__seq").desc, col("__up").desc)
        val winners = actions
          .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        val survivors = winners.filter(col("__up"))
          .select(dataCols.map(col): _*)
        baseDf.join(actions.select(keyCols.map(col): _*).distinct(),
          keyCols, "left_anti")
          .unionByName(survivors)
      }
    }

  /** Fold the accumulated patches into a new base snapshot (the
    * OPTIMIZE / compaction half of merge-on-read) and drop the
    * now-folded patch dirs. */
  def compact(spark: SparkSession): Unit = {
    val resolved = load(spark).getOrElse(throw new IllegalStateException(
      "nothing to compact — the sink has no committed state"))
    // materialize before overwrite: the resolved frame reads the
    // base dir the new version will sit beside (safe) AND the patch
    // dirs this compaction retires (deleted only after the swap)
    val (_, old) = state.get
    overwrite(resolved)
    old.foreach { pid =>
      val dir = new java.io.File(path, s"patch=$pid")
      Option(dir.listFiles()).foreach(_.foreach { sub =>
        Option(sub.listFiles()).foreach(_.foreach(_.delete()))
        sub.delete()
      })
      dir.delete()
    }
  }

  /** Bytes under a sink subdirectory — the evidence surface for the
    * "a small merge writes ∝ delta, not ∝ table" contract. */
  def bytesUnder(prefix: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).toSeq.flatten.map(walk).sum
    Option(new java.io.File(path).listFiles()).toSeq.flatten
      .filter(_.getName.startsWith(prefix)).map(walk).sum
  }
}
