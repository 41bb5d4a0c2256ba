package graft.sources

import org.apache.spark.sql.types._

/** One Iceberg-style partition TRANSFORM (hidden partitioning): a
  * named function of a source column that becomes the table's hive
  * partition key without the user ever writing — or seeing — the
  * derived column. The engine synthesizes a hidden GENERATED column
  * (`ts` → `ts_day`), computes it at write time, lays files out by
  * it, derives file-skipping predicates on it from plain predicates
  * on the source column, and drops it from every read surface.
  *
  * Supported kinds (Iceberg's spec surface):
  *   - `years(c)` / `months(c)` / `days(c)` / `hours(c)` over
  *     DATE/TIMESTAMP/TIMESTAMP_NTZ — monotonic, so range predicates
  *     on `c` derive range predicates on the hidden column;
  *   - `bucket(n, c)` — `pmod(hash(c), n)`, equality/IN-only
  *     derivation (a hash bucket is not order-preserving);
  *   - `truncate(w, c)` — string prefix (`left(c, w)`) or integral
  *     width-truncation (`c - pmod(c, w)`), both monotonic.
  *
  * Parameterized kinds carry the parameter IN the hidden column name
  * (`id_bucket_16`): re-evolving to a different modulus then creates
  * a DIFFERENT column, so stats written under the old modulus can
  * never serve (unsound) skips against the new one. */
private[sources] final case class PartitionTransform(kind: String,
                                                     source: String,
                                                     param: Option[Int]) {
  /** Canonical spec string, the form persisted in the log. */
  def spec: String = param match {
    case Some(p) => s"$kind($p,$source)"
    case None    => s"$kind($source)"
  }

  def hiddenCol: String = kind match {
    case "years"    => s"${source}_year"
    case "months"   => s"${source}_month"
    case "days"     => s"${source}_day"
    case "hours"    => s"${source}_hour"
    case "bucket"   => s"${source}_bucket_${param.get}"
    case "iceberg_bucket" => s"${source}_ibucket_${param.get}"
    case "truncate" => s"${source}_trunc_${param.get}"
  }

  /** Is the transform order-preserving in its source? Decides
    * whether range predicates may derive (bucket may not). */
  def monotonic: Boolean =
    kind != "bucket" && kind != "iceberg_bucket"

  /** The hidden column's data type — static per (kind, source type)
    * so table CREATE stays sessionless. Must agree with what
    * [[exprFor]]'s expression resolves to. */
  def typeFor(f: StructField): DataType = kind match {
    case "years"  => IntegerType
    case "days"   => DateType
    case "months" | "hours" => f.dataType match {
      case TimestampNTZType => TimestampNTZType // date_trunc preserves NTZ
      case _                => TimestampType
    }
    case "bucket" | "iceberg_bucket" => IntegerType
    case "truncate" => f.dataType match {
      case StringType => StringType
      case _          => LongType // `c - pmod(c, wL)` widens to BIGINT
    }
  }

  /** The generated-column SQL expression, type-checked against the
    * source field. Every shape here is one the predicate-derivation
    * templates in `LogTable.derivedConjuncts` recognize — that
    * pairing is the whole feature: a filter on the SOURCE column
    * skips files by the HIDDEN column's stats. */
  def exprFor(f: StructField): String = {
    def requireTime(): Unit = f.dataType match {
      case DateType | TimestampType | TimestampNTZType => ()
      case other => throw new IllegalArgumentException(
        s"partition transform '$spec' needs a date/timestamp " +
          s"source, but '${f.name}' is ${other.sql}")
    }
    kind match {
      case "years"  => requireTime(); s"year(`$source`)"
      case "months" => requireTime(); s"date_trunc('MONTH', `$source`)"
      case "days"   => requireTime(); s"CAST(`$source` AS DATE)"
      case "hours"  => requireTime(); s"date_trunc('HOUR', `$source`)"
      case "bucket" =>
        require(param.exists(_ > 0),
          s"bucket transform needs a positive modulus, got $param")
        s"pmod(hash(`$source`), ${param.get})"
      case "iceberg_bucket" =>
        // Iceberg's spec bucket hash (Appendix B murmur3, seed 0) —
        // the layout that crosses the Iceberg metadata boundary with
        // CORRECT foreign pruning; needs the graft_iceberg_bucket
        // function (GraftExtensions) registered in the session
        require(param.exists(_ > 0),
          s"iceberg_bucket transform needs a positive modulus, " +
            s"got $param")
        f.dataType match {
          case ByteType | ShortType | IntegerType | LongType |
               DateType | TimestampType | TimestampNTZType |
               StringType | BinaryType =>
            s"graft_iceberg_bucket(`$source`, ${param.get})"
          case other => throw new IllegalArgumentException(
            s"iceberg_bucket transform needs an int/long/date/" +
              s"timestamp/string/binary source, but '${f.name}' " +
              s"is ${other.sql}")
        }
      case "truncate" =>
        require(param.exists(_ > 0),
          s"truncate transform needs a positive width, got $param")
        f.dataType match {
          case StringType => s"left(`$source`, ${param.get})"
          case ByteType | ShortType | IntegerType | LongType =>
            s"`$source` - pmod(`$source`, ${param.get}L)"
          case other => throw new IllegalArgumentException(
            s"truncate transform needs a string or integral source, " +
              s"but '${f.name}' is ${other.sql}")
        }
    }
  }
}

private[sources] object PartitionTransforms {
  private val Unary =
    """\s*(years|months|days|hours)\s*\(\s*`?([A-Za-z_][A-Za-z0-9_]*)`?\s*\)\s*""".r
  private val Binary =
    ("""\s*(bucket|iceberg_bucket|truncate)""" +
      """\s*\(\s*(\d+)\s*,\s*`?([A-Za-z_][A-Za-z0-9_]*)`?\s*\)\s*""").r

  /** Parse one `partitionBy` entry. A bare column name is identity
    * layout (None); a transform call parses to its model; anything
    * else that LOOKS like a call is refused rather than silently
    * treated as a (nonexistent) column name. */
  def parse(entry: String): Option[PartitionTransform] = entry match {
    case Unary(kind, src)         => Some(PartitionTransform(kind, src, None))
    case Binary(kind, p, src)     =>
      Some(PartitionTransform(kind, src, Some(p.toInt)))
    case e if e.contains("(") =>
      throw new IllegalArgumentException(
        s"unsupported partition transform '$e' — supported: " +
          "years(c), months(c), days(c), hours(c), bucket(n, c), " +
          "iceberg_bucket(n, c), truncate(w, c), or a bare column " +
          "name")
    case _ => None
  }
}
