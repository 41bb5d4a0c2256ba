package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate record linkage (fuzzy join) for entity resolution —
  * matching dirty registries against a clean one without a cross
  * join.
  *
  * Scale design: candidate generation uses FastSS deletion
  * neighborhoods (Bocek et al., 2007): two strings are within edit
  * distance 1 (insert / delete / substitute) iff their 1-deletion
  * neighborhoods — the string itself plus every variant with one
  * character removed — intersect. Each side therefore explodes to
  * `len+1` short keys (hashed to 8-byte join keys), the join is a
  * plain keyed equi-join on those hashes, and the exact Levenshtein
  * check runs only on the candidate pairs. Work is linear in total
  * string length; the shuffle carries hashes + ids, never a
  * quadratic pair set. The reference has no linkage operator — this
  * covers the "match incoming dirty dimension rows to the master
  * registry" step its SCD merges assume has already happened
  * (lakehouse-poc `Load & SCD-Merge.py` keys on exact ids only).
  */
object Linkage {

  /** The string itself plus every 1-deletion variant, as an array
    * column. Pure Catalyst (`transform` over a `sequence`), so it
    * stays inside whole-stage codegen — no UDF. */
  private[graft] def delNeighborhood(c: Column): Column =
    array_union(
      array(c),
      transform(sequence(lit(1), length(c)), i =>
        concat(c.substr(lit(1), i - lit(1)), c.substr(i + lit(1), length(c)))))

  /** Edit-distance-≤1 join of `left[lId, lName]` against
    * `right[rId, rName]`.
    *
    * Plan: explode each side's deletion neighborhood, hash every
    * variant to an 8-byte key, equi-join on the hash with a cheap
    * `|len(l) − len(r)| ≤ 1` guard, de-duplicate candidate id pairs
    * (two strings can share several variants), then verify with the
    * codegen'd `levenshtein`. Hash collisions only ever ADD
    * candidates, which verification removes — correctness never
    * depends on collision-freedom. Output carries both ids, both
    * names, and the exact distance. */
  def fuzzyJoinEd1(left: DataFrame, lId: String, lName: String,
                   right: DataFrame, rId: String, rName: String): DataFrame = {
    def side(df: DataFrame, id: String, name: String,
             p: String): DataFrame =
      df.select(col(id).as(s"${p}_id"), col(name).as(s"${p}_name"))
        .withColumn("__v", explode(delNeighborhood(col(s"${p}_name"))))
        .select(col(s"${p}_id"), col(s"${p}_name"),
          xxhash64(col("__v")).as("__vk"),
          length(col(s"${p}_name")).as(s"__${p}len"))
    val l = side(left, lId, lName, "l")
    val r = side(right, rId, rName, "r")
    val cand = l.join(r, "__vk")
      .where(abs(col("__llen") - col("__rlen")) <= 1)
      .select(col("l_id"), col("l_name"), col("r_id"), col("r_name"))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("l_name"), col("r_name")))
      .where(col("dist") <= 1)
  }
}
