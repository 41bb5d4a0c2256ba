package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench-only tier synthesizer: scale a testdata directory up by an
  * integer factor so the scale sweep can measure a genuine 10× step
  * ABOVE the driver's largest tier (sf0.1 → sf1), where fixed
  * per-job overheads stop dominating and scaling exponents stop
  * being floor-compressed.
  *
  * Each copy `c` offsets every entity key by `c · 10^7` (beyond any
  * real key), so intra-copy join relationships are preserved exactly
  * and cross-copy keys never collide — the scaled star schema has
  * the same per-key fan-outs, selectivities and value distributions
  * as the source tier, ×factor rows. Content tables are VARIED per
  * copy, not duplicated — duplicated text/vectors would hand the
  * dedup operators ×factor artificial near-dup groups and make the
  * sweep measure a workload that does not exist at a real sf1:
  *
  *  - documents: copy 0 keeps the original text; copies > 0 apply a
  *    BIJECTIVE per-copy token rename (prefix every token with the
  *    copy id). A bijection preserves token/shingle-set relations —
  *    intersections, Jaccard, duplicate groups — EXACTLY within the
  *    copy, while making copies' vocabularies pairwise disjoint, so
  *    near-dup pair counts scale linearly with the factor the way a
  *    real larger corpus's would. (An earlier variant permuted word
  *    order per copy; that kept token SETS identical across copies —
  *    colliding LSH buckets — and pushed every doc in a copy into
  *    one global token order, correlating word-shingles intra-copy:
  *    both made the dedup family superlinear on the synthesized
  *    tier only.)
  *  - customer/supplier/part names: copies > 0 get a 3-char
  *    copy-derived suffix, keeping intra-copy edit-distance
  *    structure intact while placing distinct copies ≥3 edits apart
  *    (beyond the fuzzy ops' maxDist), so linkage blocks don't
  *    accrete identical names ×factor.
  *  - embeddings: copies > 0 get hash-derived unit vectors of the
  *    same dimensionality (ANN/dedup timings need cardinality and
  *    dimension, not the source tier's exact geometry).
  *
  * region/nation are dimension enums and stay as-is. Synthesis is
  * one distributed pass per table, cached behind a completion marker
  * so repeated bench runs pay it once. NOT part of the library
  * surface — the oracle gate never reads synthesized tiers.
  */
object GenScale {

  private val Off = 10000000L

  private def replicate(df: DataFrame, factor: Int,
                        keyCols: Seq[String]): DataFrame = {
    val copies = explode(sequence(lit(0L), lit(factor - 1L))).as("__copy")
    val base = df.select(col("*"), copies)
    keyCols.foldLeft(base)((d, k) =>
      d.withColumn(k, col(k) + col("__copy") * Off))
      .drop("__copy")
  }

  /** Suffix name columns per copy (copy 0 untouched): 3 identical
    * copy-derived letters after a '#', so names from different
    * copies sit ≥3 edits apart while every intra-copy edit
    * relationship is preserved verbatim. */
  private def varyNames(df: DataFrame, keyCol: String,
                        nameCols: Seq[String]): DataFrame = {
    val cpy = expr(s"$keyCol div ${Off}L")
    val suffix = concat(lit("#"),
      expr(s"repeat(chr(97 + pmod($keyCol div ${Off}L, 26)), 3)"))
    nameCols.foldLeft(df)((d, c) =>
      d.withColumn(c, when(cpy === 0L, col(c))
        .otherwise(concat(col(c), suffix))))
  }

  /** Synthesize `outDir` (factor × `srcDir`) unless a completed copy
    * is already there. Returns outDir on success. */
  def ensure(spark: SparkSession, srcDir: String, outDir: String,
             factor: Int = 10): String = {
    val marker = new java.io.File(outDir, "_GRAFT_COMPLETE")
    if (marker.exists) return outDir
    def load(t: String): DataFrame =
      graft.sources.Tables.load(spark, srcDir, t)
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    write(load("region"), "region")
    write(load("nation"), "nation")
    write(varyNames(replicate(load("customer"), factor, Seq("c_custkey")),
      "c_custkey", Seq("c_name")), "customer")
    write(varyNames(replicate(load("supplier"), factor, Seq("s_suppkey")),
      "s_suppkey", Seq("s_name")), "supplier")
    write(varyNames(replicate(load("part"), factor, Seq("p_partkey")),
      "p_partkey", Seq("p_name")), "part")
    write(replicate(load("orders"), factor,
      Seq("o_orderkey", "o_custkey")), "orders")
    write(replicate(load("lineitem"), factor,
      Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
    // Tables.load expects events.ts as raw long nanos (the source
    // tier's TIMESTAMP(NANOS) convention) — convert back on write
    write(replicate(load("events"), factor, Seq("event_id", "user_id"))
      .withColumn("ts", expr("unix_micros(ts) * 1000L")), "events")

    val docs = replicate(load("documents"), factor, Seq("doc_id"))
      .withColumn("__copy", (col("doc_id") / Off).cast("long"))
    write(docs.withColumn("text",
      when(col("__copy") === 0L, col("text")).otherwise(
        // bijective per-copy token rename (see scaladoc): order,
        // counts and intra-copy set relations preserved exactly;
        // vocabularies disjoint across copies
        concat_ws(" ", expr(
          "transform(split(text, ' '), w -> concat(__copy, '_', w))"))))
      .drop("__copy"), "documents")

    val emb = replicate(load("embeddings"), factor, Seq("vec_id"))
      .withColumn("__copy", (col("vec_id") / Off).cast("long"))
    val raw = expr("transform(sequence(1, size(embedding)), " +
      "i -> cast(pmod(xxhash64(vec_id, i), 2000) - 1000 AS double) / 1000.0)")
    val normed = expr("transform(__raw, x -> cast(x / sqrt(" +
      "aggregate(__raw, cast(0.0 AS double), (a, y) -> a + y * y)) AS float))")
    write(emb
      .withColumn("__raw", raw)
      .withColumn("embedding",
        when(col("__copy") === 0L, col("embedding")).otherwise(normed))
      .drop("__copy", "__raw"), "embeddings")

    java.nio.file.Files.createDirectories(marker.toPath.getParent)
    java.nio.file.Files.writeString(marker.toPath, s"factor=$factor")
    outDir
  }
}
