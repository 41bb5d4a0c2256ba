package graft

import graft.operators.Dedup
import graft.functions._
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while the cat sleeps on the warm mat near the door and the bird " +
    "sings a song about the morning sun above the hills"
  // near-dup: one word changed; far doc: disjoint vocabulary
  private val nearDup = base.replace("warm", "cold")
  private val far = "completely different content talking about spark " +
    "catalyst optimizer plans and shuffle partitions at massive scale"

  private lazy val docs = Seq(
    (0L, base), (1L, nearDup), (2L, far),
    (3L, base + " extra tail words here"), (4L, "tiny")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val dup = Seq((0L, "same"), (1L, "same"), (2L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(dup).orderBy("keep_id")
      .as[(Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 2L), (2L, 1L)))
  }

  test("minhash estimates jaccard within tolerance") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 128)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sh = docs.select(col("doc_id"),
      array_distinct(wordShingles(col("text"), 3)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    for (a <- Seq(0L); b <- Seq(1L, 2L)) {
      val est = sigs(a).zip(sigs(b)).count { case (x, y) => x == y } / 128.0
      val exact = sh(a).intersect(sh(b)).size.toDouble / sh(a).union(sh(b)).size
      assert(math.abs(est - exact) < 0.15,
        s"pair ($a,$b): est $est vs exact $exact")
    }
  }

  test("minhashLsh surfaces planted near-dups, not far pairs") {
    val pairs = Dedup.minhashLsh(docs, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("simhash: identical docs equal, near-dups close, far docs far") {
    val fp = Dedup.simhash(docs.union(Seq((5L, base)).toDF("doc_id", "text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(5L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(0L), fp(1L)) < ham(fp(0L), fp(2L)))
  }

  test("simhashPairs verifies hamming bound") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 10).collect()
    pairs.foreach(r => assert(r.getAs[Int]("hamming") <= 10))
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((0L, 1L)))
  }

  test("declarative-hash simhash variant: same structural behavior " +
    "(identical docs collide, planted near-dup surfaces) on an " +
    "externally-recomputable fingerprint") {
    val fp = Dedup.simhash(
      docs.union(Seq((5L, base)).toDF("doc_id", "text")),
      declarativeHash = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(5L))
    // entropy confined to the low 62 bits (two ~2^31 residues)
    assert(fp.values.forall(v => v >= 0L && (v >> 62) == 0L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(0L), fp(1L)) < ham(fp(0L), fp(2L)))
    val pairs = Dedup.simhashPairs(docs, maxHamming = 10,
      declarativeHash = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("maxBucket cap drops degenerate buckets, keeps ordinary pairs") {
    // 20 identical boilerplate docs → every band bucket has 20
    // members (190 pairs each); the planted near-dup pair is
    // unrelated text in its own buckets
    val boiler = (100L until 120L).map(i => (i, "mass produced " +
      "boilerplate licence text repeated verbatim across the corpus"))
    val all = docs.union(boiler.toDF("doc_id", "text"))
    val capped = Dedup.minhashLsh(all, threshold = 0.5, maxBucket = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((0L, 1L)))
    assert(!capped.exists(p => p._1 >= 100L && p._2 >= 100L))
    // uncapped, the boilerplate clique is present
    val open = Dedup.minhashLsh(all, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(open.contains((100L, 101L)))
    // same guard on the simhash path
    val simCapped = Dedup.simhashPairs(all, maxHamming = 10,
      maxBucket = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!simCapped.exists(p => p._1 >= 100L && p._2 >= 100L))
  }

  test("ngramJaccard finds near-dup with correct score") {
    val out = Dedup.ngramJaccard(docs, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.contains((0L, 1L)))
    assert(out((0L, 1L)) > 0.5 && out((0L, 1L)) < 1.0)
    assert(!out.keys.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("exact dedup shuffles hashed keys, not the corpus") {
    // the aggregation must group by (length, xxhash64) — 16 bytes/row
    // through the exchange — never by the raw text column (asserted
    // on the analyzed plan: the optimizer folds a LocalRelation's
    // grouping expressions away in this in-memory test)
    val plan = Dedup.exact(docs).queryExecution.analyzed.toString
    val aggLine = plan.linesIterator
      .find(_.contains("Aggregate")).getOrElse(plan)
    assert(aggLine.contains("xxhash64"), plan)
    assert(aggLine.contains("length"), plan)
  }

  test("minhashLsh and ngramJaccard plans are cross-join-free") {
    // the scale guarantee: candidate generation is bucketed equi-join
    // work; a CartesianProduct / nested-loop join anywhere means the
    // pair space went quadratic. (ngramJaccard's one-row broadcast
    // cap scalar is a BroadcastNestedLoopJoin by construction, so it
    // is exercised with the static cap here.)
    for (df <- Seq(
        Dedup.minhashLsh(docs, threshold = 0.5),
        Dedup.ngramJaccard(docs, threshold = 0.5, maxDf = 100))) {
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("CartesianProduct"), phys.take(500))
      assert(!phys.contains("BroadcastNestedLoopJoin"), phys.take(500))
    }
  }

  test("segmentDupStats profiles cross-corpus duplicated chunks") {
    // docs 0 and 1 share their first 4-word chunk; doc 2 is unique
    val docs = Seq(
      (0L, "aa bb cc dd ee ff gg hh"),
      (1L, "aa bb cc dd zz yy xx ww"),
      (2L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val stats = Dedup.segmentDupStats(docs, k = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats(0L) == (2L, 1L)) // 2 chunks, 1 duplicated
    assert(stats(1L) == (2L, 1L))
    assert(stats(2L) == (2L, 0L))
  }

  test("wordChunkSegments covers every token exactly once") {
    val docs = Seq((0L, "a b c d e f g")).toDF("doc_id", "text")
    val segs = Dedup.wordChunkSegments(docs, "doc_id", "text", 3)
      .orderBy("seg_idx").select("seg").as[String].collect()
    assert(segs.sameElements(Array("a b c", "d e f", "g")))
  }

  test("embeddingNearDup on handcrafted vectors") {
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.99f, 0.1f, 0f, 0f)), // ~cos 0.995 with 0
      (2L, Array(0f, 1f, 0f, 0f))       // orthogonal to 0
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(emb, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("embeddingNearDup tiled join: cartesian-free plan, complete pairs") {
    // 40 vectors spread over the tile grid: every unordered pair must
    // surface exactly once whatever tile it lands in (diagonal tiles
    // dedup by id order, cross tiles meet once) — verified against
    // the O(n²) definition computed locally
    val vecs = (0L until 40L).map { i =>
      val a = (i % 7).toFloat; val b = (i % 5).toFloat
      (i, Array(1f + a, 2f + b, 3f, 4f - a))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    def cosine(x: Array[Float], y: Array[Float]): Double = {
      val d = x.zip(y).map(p => p._1.toDouble * p._2).sum
      d / (math.sqrt(x.map(v => v.toDouble * v).sum) *
        math.sqrt(y.map(v => v.toDouble * v).sum))
    }
    val expected = (for {
      (ia, va) <- vecs; (ib, vb) <- vecs
      if ia < ib && cosine(va, vb) >= 0.99
    } yield (ia, ib)).toSet
    val out = Dedup.embeddingNearDup(emb, threshold = 0.99, blocks = 4)
    assert(out.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      == expected)
    assert(expected.nonEmpty)
    val phys = out.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"), phys.take(500))
    assert(!phys.contains("BroadcastNestedLoopJoin"), phys.take(500))
  }

  test("embeddingNearDup refuses past the pair budget, NAMING the " +
    "sub-quadratic routes — and an in-budget run is unchanged") {
    val emb = (0L until 30L).map(i =>
      (i, Array(1f + (i % 7), 2f, 3f, 4f))).toDF("vec_id", "embedding")
    // 30 vectors = 435 pairs: over a 100-pair budget
    val e = intercept[IllegalArgumentException](
      Dedup.embeddingNearDup(emb, maxPairsBudget = 100L))
    assert(e.getMessage.contains("embeddingNearDupLsh") &&
      e.getMessage.contains("semanticDedup"), e.getMessage)
    // explicit opt-in (raised budget) and the default both run
    assert(Dedup.embeddingNearDup(emb, threshold = 0.999,
      maxPairsBudget = 1000L).count() ==
      Dedup.embeddingNearDup(emb, threshold = 0.999).count())
  }

  test("semanticDedup collapses planted dups within clusters only") {
    // three well-separated axis clusters of 10 vectors; pairs
    // (i, i+15) for i < 3 are exact duplicates (one per cluster);
    // every other vector perturbs a UNIQUE dimension, so non-dup
    // cosines cap at 1/1.25 = 0.8 — far below the 0.999 threshold
    val emb = (0 until 30).map { i =>
      val axis = i % 3
      val v = Array.fill(40)(0f)
      v(axis) = 1f
      val dupSeed = if (i >= 15 && i < 18) i - 15 else i
      if (dupSeed < 3 && (i < 3 || i >= 15)) v(3 + dupSeed) = 0.001f
      else v(10 + i) = 0.5f
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val mapping = graft.operators.Dedup
      .semanticDedup(emb, k = 3, threshold = 0.999)
      .select("vec_id", "rep_id").as[(Long, Long)].collect().toMap
    // planted pairs (0,15),(1,16),(2,17) collapse to the lower id
    assert(mapping(15L) == 0L && mapping(16L) == 1L && mapping(17L) == 2L)
    // everything else is its own representative
    (0 until 30).filter(i => i < 15 || i >= 18).foreach { i =>
      assert(mapping(i.toLong) == i.toLong, s"vec $i should be kept")
    }
    // deterministic under repartitioning
    val again = graft.operators.Dedup
      .semanticDedup(emb.repartition(5), k = 3, threshold = 0.999)
      .select("vec_id", "rep_id").as[(Long, Long)].collect().toMap
    assert(again == mapping)
  }

  test("embeddingNearDupLsh: full recall on planted near-dups at high cos") {
    // planted pairs at cosine ≈ 0.995 (the near-duplicate regime LSH
    // is for); background vectors are far apart. At bits=8/tables=8
    // the SRP candidate probability for θ ≈ 5.7° is 1−(1−0.968^8)^8
    // ≈ 1−2e-5 — and the planes are deterministic, so this test is
    // stable. Output must match the exact tiled join bit-for-bit.
    val rnd = new scala.util.Random(7)
    val emb = (0L until 60L).flatMap { i =>
      val v = Array.fill(16)(rnd.nextGaussian().toFloat)
      val dup = v.zipWithIndex.map { case (x, j) =>
        if (j == 0) x + 0.05f else x }
      Seq((i * 2, v), (i * 2 + 1, dup))
    }.toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDup(emb, threshold = 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.embeddingNearDupLsh(emb, threshold = 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty)
    assert(lsh == exact)
    val phys = Dedup.embeddingNearDupLsh(emb, threshold = 0.98)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"), phys.take(500))
    assert(!phys.contains("BroadcastNestedLoopJoin"), phys.take(500))
  }

  test("incrementalDedup equals the full-pair formulation restricted " +
      "to backward matches") {
    val all = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "documents")
    val corpus = all.filter(col("doc_id") < 400)
    val batch = all.filter(col("doc_id") >= 400)
    val out = Dedup.incrementalDedup(corpus, batch, threshold = 0.5)
    // reference: all ≥0.5-jaccard pairs whose LARGER id is in the
    // batch — i.e. every backward match a batch doc could dedup onto
    val pairs = Dedup.minhashLsh(all, threshold = 0.5)
      .filter(col("id_b") >= 400)
      .select(col("id_a"), col("id_b").as("doc_id"))
    val expected = batch.select(col("doc_id"))
      .join(pairs, Seq("doc_id"), "left")
      .groupBy(col("doc_id"))
      .agg(min(col("id_a")).as("dup_of"),
        count(col("id_a")).as("n_matches"))
      .withColumn("admitted", col("dup_of").isNull)
    assert(out.count() == batch.count(), "one admission row per batch doc")
    assert(out.except(expected).isEmpty && expected.except(out).isEmpty)
    // at least one corpus rejection and one intra-batch rejection in
    // the fixture, or the test proves nothing
    val rejectedVia = out.filter(!col("admitted"))
      .select("dup_of").as[Long].collect()
    assert(rejectedVia.exists(_ < 400) && rejectedVia.exists(_ >= 400))
  }
}
