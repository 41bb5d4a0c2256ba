package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistence binding for dimension tables — the seam between the
  * engine's pure merge plans and a storage format.
  *
  * The reference maintains its dimensions as transactional Delta
  * tables mutated in place with `MERGE INTO` (reference:
  * notebooks/pipeline_core.py:119-268, notebooks/Load &
  * SCD-Merge.py:24-38). This engine computes the post-merge state as
  * a DataFrame instead — format-agnostic — and delegates the commit
  * to a `DimSink`, so the same pipeline runs on plain parquet today
  * and on a transactional table format (Delta/Iceberg) by swapping
  * the sink, with the merge plan unchanged.
  */
trait DimSink {
  /** Current dimension state, or None on first run. */
  def load(spark: SparkSession): Option[DataFrame]

  /** Commit a full post-merge dimension state. */
  def overwrite(dim: DataFrame): Unit
}

/** Parquet-directory sink.
  *
  * Parquet has no transactional commit, and the merged frame READS
  * the directory it is about to replace — so the frame is
  * materialized (persist + count) before the overwrite. That closes
  * the read-your-own-input hazard but is NOT atomic against
  * concurrent readers: a reader racing the rewrite can see a partial
  * directory. A table format with snapshot isolation (the sinks
  * below) removes both caveats; this one exists so the engine runs
  * with zero extra jars. */
final class ParquetDimSink(path: String) extends DimSink {
  override def load(spark: SparkSession): Option[DataFrame] =
    if (new java.io.File(path).exists) Some(spark.read.parquet(path))
    else None

  override def overwrite(dim: DataFrame): Unit = {
    val cached =
      dim.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      cached.count() // materialize BEFORE overwriting our own input
      cached.write.mode("overwrite").parquet(path)
    } finally { cached.unpersist(); () }
  }
}

/** Snapshot-versioned parquet sink: every commit writes a NEW
  * immutable version directory (`v=N/`) and then atomically swaps a
  * one-line manifest file pointing at it — the minimal form of the
  * MVCC trick Delta/Iceberg use. Readers resolve the manifest first,
  * so they always see a complete snapshot (no partial-directory
  * window, unlike ParquetDimSink's in-place rewrite), concurrent
  * with a writer; old versions stay readable for time travel and
  * audits until `vacuum`. The manifest swap is a same-filesystem
  * atomic rename; multi-writer coordination is out of scope (same
  * as Delta without a locking LogStore on plain object stores). */
final class VersionedParquetSink(path: String,
                                 clock: () => Long =
                                   () => System.currentTimeMillis())
  extends DimSink {
  private def manifest = new java.io.File(path, "_CURRENT")

  /** Committed version numbers, oldest first. */
  def versions: Seq[Long] =
    Option(new java.io.File(path).listFiles()).toSeq.flatten
      .flatMap(f => if (f.getName.startsWith("v="))
        Some(f.getName.stripPrefix("v=").toLong) else None)
      .sorted

  /** Version the manifest currently points at, if any commit
    * completed. */
  def currentVersion: Option[Long] =
    if (manifest.exists)
      Some(java.nio.file.Files.readString(manifest.toPath).trim.toLong)
    else None

  /** Time travel: read an arbitrary committed version. */
  def loadVersion(spark: SparkSession, v: Long): DataFrame =
    spark.read.parquet(s"$path/v=$v")

  /** Commit wall-clock of a version (epoch millis, from the
    * injectable `clock`), if recorded. Underscore-prefixed marker
    * file inside the immutable version dir — invisible to parquet
    * readers, vacuumed with its version. Versions committed before
    * this feature existed simply have no timestamp. */
  def commitTime(v: Long): Option[Long] = {
    val f = new java.io.File(path, s"v=$v/_COMMITTED_AT")
    if (f.exists) Some(java.nio.file.Files.readString(f.toPath).trim.toLong)
    else None
  }

  /** `TIMESTAMP AS OF` time travel: the newest version whose commit
    * time is ≤ `tsMillis` — between-commits timestamps resolve to the
    * snapshot that was current then, exactly Delta/Iceberg semantics.
    * Throws if the sink has no commit at-or-before the asked time. */
  def versionAt(tsMillis: Long): Long = {
    val candidates = versions
      .flatMap(v => commitTime(v).map(v -> _))
      .filter(_._2 <= tsMillis)
    if (candidates.isEmpty) throw new IllegalArgumentException(
      s"no committed version at or before $tsMillis " +
        s"(earliest commit: ${versions.flatMap(commitTime).minOption})")
    candidates.maxBy(_._2)._1
  }

  /** Read the snapshot that was current at `tsMillis`. */
  def loadVersionAt(spark: SparkSession, tsMillis: Long): DataFrame =
    loadVersion(spark, versionAt(tsMillis))

  override def load(spark: SparkSession): Option[DataFrame] =
    currentVersion.map(loadVersion(spark, _))

  override def overwrite(dim: DataFrame): Unit = {
    val next = currentVersion.getOrElse(-1L) + 1L
    // the new version is written BESIDE the current one — the frame
    // may read the snapshot it replaces, and unlike an in-place
    // rewrite that is safe here, so no materialize-first workaround
    dim.write.mode("overwrite").parquet(s"$path/v=$next")
    // record the commit instant INSIDE the version dir before the
    // manifest swap: a version is only visible once its timestamp is
    // durable, so versionAt never sees a half-committed version
    java.nio.file.Files.writeString(
      new java.io.File(path, s"v=$next/_COMMITTED_AT").toPath,
      clock().toString)
    val tmp = new java.io.File(path, s"_CURRENT.tmp$next")
    java.nio.file.Files.writeString(tmp.toPath, next.toString)
    java.nio.file.Files.move(tmp.toPath, manifest.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Drop all committed versions older than the current one. */
  def vacuum(): Unit = currentVersion.foreach { cur =>
    versions.filter(_ < cur).foreach { v =>
      val dir = new java.io.File(path, s"v=$v")
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  /** Retention-policy expiration (the `expire_snapshots` / VACUUM
    * RETAIN surface of log-based table formats): keep the newest
    * `keepLast` committed versions — and always the one the manifest
    * points at — expire the rest, returning the (version, status)
    * audit oldest-first. Readers time-traveling a retained version
    * are unaffected; expiring only strictly-older versions means a
    * concurrent reader of the CURRENT snapshot can never lose files
    * mid-scan. */
  def expireSnapshots(keepLast: Int): Seq[(Long, String)] = {
    require(keepLast >= 1, s"need keepLast >= 1, got $keepLast")
    val vs = versions
    val keep = vs.takeRight(keepLast).toSet ++ currentVersion
    vs.map { v =>
      if (keep(v)) v -> "retained"
      else {
        val dir = new java.io.File(path, s"v=$v")
        Option(dir.listFiles()).foreach(_.foreach(_.delete()))
        dir.delete()
        v -> "expired"
      }
    }
  }
}

/** Delta Lake sink — a thin binding that compiles against no Delta
  * classes (the format is resolved by name at runtime), so it is
  * usable the moment `delta-spark` jars are on the classpath and the
  * session is configured with the Delta extension. Delta's MVCC log
  * makes the overwrite a transactional snapshot swap: no
  * materialize-first workaround, readers never see partial state.
  * `DimSink.forPath` only selects this sink when the classes are
  * actually loadable. */
final class DeltaDimSink(path: String) extends DimSink {
  override def load(spark: SparkSession): Option[DataFrame] =
    if (new java.io.File(path, "_delta_log").exists)
      Some(spark.read.format("delta").load(path))
    else None

  override def overwrite(dim: DataFrame): Unit =
    dim.write.format("delta").mode("overwrite").save(path)
}

/** Iceberg sink bound to a catalog table name (Iceberg is
  * catalog-first; paths are an anti-pattern there). Same
  * string-bound, no-compile-time-dependency approach as Delta:
  * `createOrReplace` is a transactional snapshot commit when an
  * Iceberg catalog backs the name. */
final class IcebergDimSink(table: String) extends DimSink {
  override def load(spark: SparkSession): Option[DataFrame] =
    if (spark.catalog.tableExists(table)) Some(spark.table(table))
    else None

  override def overwrite(dim: DataFrame): Unit =
    dim.writeTo(table).using("iceberg").createOrReplace()
}

object DimSink {
  /** Is a table-format implementation on the classpath? Checked by
    * class name so this module never links against optional jars. */
  def deltaAvailable: Boolean = classPresent("io.delta.tables.DeltaTable")
  def icebergAvailable: Boolean =
    classPresent("org.apache.iceberg.spark.source.SparkTable")

  private def classPresent(name: String): Boolean =
    try { Class.forName(name); true }
    catch { case _: Throwable => false }

  /** Pick the strongest sink available for a path: Delta when its
    * jars are present, else plain parquet. */
  def forPath(path: String): DimSink =
    if (deltaAvailable) new DeltaDimSink(path)
    else new ParquetDimSink(path)
}
