package graft.operators

import graft.functions._
import graft.plans.FloatVectorExpressions.{floatDot, floatNorm, srpBuckets}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbour search over an embedding column.
  *
  * Scale design: the brute-force path broadcasts the (small) query
  * set against the (huge) corpus — a map-only pass over the corpus,
  * then per-query top-k via partial top-k aggregation; no corpus
  * shuffle. The LSH path buckets the corpus by sign-random-projection
  * so each query only scans its bucket(s) — the 100 TB route, with
  * recall traded via number of projection bits / probes.
  */
object Similarity {

  /** Per-query exact top-k over scored (query_id, neighbor_id, cos)
    * rows via the bounded-heap aggregate: every map task keeps a
    * k-sized heap per query, so the shuffle carries |tasks|·|queries|
    * ·k entries and the final merge folds heaps — never a full sort
    * of all scored rows on |queries| reducers (the window/row_number
    * formulation this replaces). Ordering (cos desc, neighbor_id
    * asc) matches the window exactly, so results are unchanged. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(graft.plans.TopKPairsAggregate
        .topKPairs(col("cos"), col("neighbor_id"), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__p", "nb")))
      .select(col("query_id"), (col("__p") + 1).cast("long").as("rank"),
        col("nb.neighbor_id").as("neighbor_id"),
        round(col("nb.cos"), 6).as("cosine"))

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors. Query side must be small (broadcast). Norms are
    * precomputed per vector — per-pair work is one dot product; the
    * per-query top-k is the bounded-heap partial aggregate
    * (per-partition top-k, then a tiny merge of |queries|·k rows). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      floatNorm(col(vecCol)).as("__qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      floatNorm(col(vecCol)).as("__cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", floatDot(col("__qv"), col("__cv")) /
        (col("__qn") * col("__cn")))
    rankTopK(scored, k)
  }

  /** Multi-table LSH (sign-random-projection) bucketed ANN: the
    * corpus is bucketed into `tables` independent hash tables (a
    * write-time/materializable pass at scale — corpus storage ×L,
    * probe cost |bucket|·L instead of |corpus|); each query joins
    * only its bucket per table, candidates are deduped, then exact
    * cosine ranks them. Recall grows with `tables`, probe cost with
    * 2^-bits — measured against bruteForceTopK in tests.
    *
    * `bits <= 0` auto-sizes the plane count to hold MEAN BUCKET
    * OCCUPANCY constant (~64 vectors) as the corpus grows: with
    * fixed bits, candidate pairs scale |corpus|·|queries|/2^bits —
    * quadratic when both grow with the data (measured 90 s at sf1 vs
    * 1.5 s at sf0.1 under bits=4). Scaling bits with log2(n) keeps
    * per-query probe cost flat, the same corpus-proportional
    * partitioning FAISS/ScaNN apply to their index sizes. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              bits: Int = 0, tables: Int = 8, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val nBits =
      if (bits > 0) bits
      else math.max(4, (math.log(corpus.count() / 64.0) /
        math.log(2.0)).ceil.toInt)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      floatNorm(col(vecCol)).as("__cn"))
      .select(col("*"), posexplode(srpBuckets(col("__cv"), nBits, tables))
        .as(Seq("t", "b")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      floatNorm(col(vecCol)).as("__qn"))
      .select(col("*"), posexplode(srpBuckets(col("__qv"), nBits, tables))
        .as(Seq("t", "b")))
    val cands = c.join(broadcast(q), Seq("t", "b"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        col("__qv"), col("__cv"), col("__qn"), col("__cn"))
      .dropDuplicates("query_id", "neighbor_id")
    rankTopK(cands
      .withColumn("cos", floatDot(col("__qv"), col("__cv")) /
        (col("__qn") * col("__cn"))), k)
  }

  /** Spherical k-means centroids for an IVF index, trained with
    * Lloyd iterations expressed as Spark aggregations.
    *
    * The centroid matrix is MODEL STATE (nlist × dims floats), so it
    * lives on the driver and is embedded into the assignment
    * expression — each iteration is one corpus scan (compiled
    * argmax-dot, no join/explode) plus a shuffle of only
    * nlist × dims partial sums (map-side aggregated). At real scale
    * train on `sampleFraction` of the corpus — k-means quality needs
    * a sample, not the population. Initialization is deterministic
    * farthest-first (greedy k-center) over a hash-ordered seed pool
    * collected to the driver: seeds spread maximally, so two seeds
    * can't land inside one tight cluster (the lowest-hash-init
    * failure mode that merges true clusters and strands duplicate
    * centroids). Empty clusters keep their previous centroid. */
  def trainIvfCentroids(corpus: DataFrame, nlist: Int, iters: Int = 3,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        sampleFraction: Double = 1.0): Seq[Seq[Float]] = {
    def normed(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      val s = if (n == 0) 1.0 else n
      v.map(x => (x / s).toFloat).toSeq
    }
    val train = (if (sampleFraction < 1.0)
      corpus.sample(withReplacement = false, sampleFraction, seed = 42)
    else corpus).select(col(idCol).as("__id"), col(vecCol).as("__v"))
    // deterministic seed pool: the 8·nlist lowest-hash rows (model
    // state — nlist×8 vectors on the driver, not data movement)
    val pool: Array[Array[Double]] = train
      .orderBy(xxhash64(col("__id")), col("__id")).limit(8 * nlist)
      .select(col("__v")).collect()
      .map(r => normed(r.getSeq[Float](0).map(_.toDouble).toArray)
        .map(_.toDouble).toArray)
    // greedy k-center: start at the lowest-hash row; repeatedly add
    // the pool vector whose max cosine to the chosen set is smallest
    // (farthest point on the sphere), ties broken by pool order
    val chosen = scala.collection.mutable.ArrayBuffer(0)
    val maxCos = Array.fill(pool.length)(Double.MinValue)
    while (chosen.length < math.min(nlist, pool.length)) {
      val last = pool(chosen.last)
      var bestI = -1
      var bestScore = Double.MaxValue
      pool.indices.foreach { i =>
        if (!chosen.contains(i)) {
          val c = last.zip(pool(i)).map(p => p._1 * p._2).sum
          if (c > maxCos(i)) maxCos(i) = c
          if (maxCos(i) < bestScore) { bestScore = maxCos(i); bestI = i }
        }
      }
      chosen += bestI
    }
    var cents: Seq[Seq[Float]] =
      chosen.toSeq.map(i => normed(pool(i)).toSeq)
    val dims = cents.head.length
    var it = 0
    while (it < iters) {
      val assigned = train.select(col("__v"),
        graft.plans.IvfExpressions.topCentroids(col("__v"), cents, 1)(0)
          .as("cid"))
      val sumCols = (0 until dims).map(i =>
        sum(element_at(col("__v"), i + 1).cast("double")).as(s"s$i"))
      val rows = assigned.groupBy(col("cid"))
        .agg(count(lit(1)).as("n"), sumCols: _*)
        .collect()
      val next = cents.toArray
      rows.foreach { r =>
        val cid = r.getInt(0); val n = r.getLong(1).toDouble
        next(cid) = normed(Array.tabulate(dims)(i => r.getDouble(i + 2) / n))
      }
      cents = next.toSeq
      it += 1
    }
    cents
  }

  /** IVF (inverted-file) bucketed ANN: the corpus is partitioned
    * into `nlist` Voronoi cells around trained centroids (a
    * write-time/materializable pass at scale — each vector is
    * assigned to exactly ONE cell, so storage is 1×, unlike
    * multi-table LSH); each query probes its `nprobe` nearest cells
    * and exact cosine reranks the union. Recall grows with nprobe,
    * probe cost with nprobe/nlist — measured against bruteForceTopK
    * in tests. Assignment is a compiled map-side argmax over the
    * embedded centroid matrix: no shuffle of the corpus beyond the
    * cell-id equi-join. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nlist: Int = 64, nprobe: Int = 8, iters: Int = 3,
              idCol: String = "vec_id",
              vecCol: String = "embedding",
              centroids: Option[Seq[Seq[Float]]] = None): DataFrame = {
    // centroids are reusable model state: pass them in to amortize
    // training across calls (tuneNprobe, repeated query batches)
    val cents = centroids.getOrElse(
      trainIvfCentroids(corpus, nlist, iters, idCol, vecCol))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      floatNorm(col(vecCol)).as("__cn"),
      graft.plans.IvfExpressions.topCentroids(col(vecCol), cents, 1)(0)
        .as("cid"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      floatNorm(col(vecCol)).as("__qn"),
      explode(graft.plans.IvfExpressions.topCentroids(col(vecCol), cents,
        nprobe)).as("cid"))
    // each corpus vector lives in exactly one cell and a query's
    // probed cells are distinct, so (query, neighbor) pairs are
    // already unique — no dedup needed
    rankTopK(c.join(broadcast(q), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", floatDot(col("__qv"), col("__cv")) /
        (col("__qn") * col("__cn"))), k)
  }

  /** K-means topic/cluster assignment over an embedding column: the
    * centroid model is trained once (spherical Lloyd, deterministic
    * init — same trainer as the IVF index) and each vector maps to
    * its nearest centroid with the compiled argmax-dot kernel. One
    * map-side pass over the corpus at assignment time; at 100 TB the
    * trainer runs on a sample (`sampleFraction`) while assignment
    * covers everything. Returns the input plus `cell`. */
  def kmeansAssign(corpus: DataFrame, k: Int, iters: Int = 5,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding",
                   sampleFraction: Double = 1.0): DataFrame = {
    val cents = trainIvfCentroids(corpus, k, iters, idCol, vecCol,
      sampleFraction)
    corpus.withColumn("cell",
      graft.plans.IvfExpressions.topCentroids(col(vecCol), cents, 1)(0)
        .cast("int"))
  }

  /** Per-group embedding centroids as (group, dim, n, centroid)
    * rows — the vector-aggregation primitive behind class prototypes,
    * source drift monitoring and IVF-style seeding from labels.
    *
    * Scale design: posexplode fans each vector into (dim, value)
    * rows that partial-aggregate map-side, so the shuffle carries
    * |groups|·dims partial sums per task — never vectors. Sums run
    * in DECIMAL (exact, order-independent) and divide once at the
    * end, so centroids are bit-reproducible under any partitioning
    * (a double sum would drift with aggregation order). */
  def groupCentroids(emb: DataFrame, groupCol: String,
                     vecCol: String = "embedding"): DataFrame =
    emb.select(col(groupCol), posexplode(col(vecCol)).as(Seq("__p", "__x")))
      .groupBy(col(groupCol), (col("__p") + 1).cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast("double").cast("decimal(28,10)")).as("__s"))
      .select(col(groupCol), col("dim"), col("n"),
        round(col("__s").cast("double") / col("n"), 6).as("centroid"))

  /** Measured recall@k of an ANN result against the brute-force
    * truth for the same queries: |ANN ∩ exact| / |exact|. */
  def recallAtK(ann: DataFrame, exact: DataFrame): Double = {
    val hit = ann.select(col("query_id"), col("neighbor_id"))
      .join(exact.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
    val Array(nHit, nExact) = Array(hit.count(), exact.count())
    if (nExact == 0) 1.0 else nHit.toDouble / nExact
  }

  /** Probe auto-tuning: the smallest `nprobe` whose recall@k reaches
    * `targetRecall`, measured on a deterministic sample of the query
    * set against brute force over the corpus.
    *
    * This is MODEL TUNING, not a data-path operator: the sample is
    * small by construction (brute force on it is |sample|·|corpus|
    * map work — the thing IVF avoids for the full query load), the
    * centroids are trained ONCE and reused across candidate probes,
    * and the chosen nprobe then serves the whole query stream.
    * Returns (nprobe, measured recall, centroids) so the caller can
    * hand the trained model straight to `ivfTopK`. */
  def tuneNprobe(queries: DataFrame, corpus: DataFrame, k: Int,
                 nlist: Int = 64, targetRecall: Double = 0.9,
                 sampleQueries: Int = 20, iters: Int = 3,
                 idCol: String = "vec_id", vecCol: String = "embedding")
      : (Int, Double, Seq[Seq[Float]]) = {
    val sample = queries.orderBy(xxhash64(col(idCol))).limit(sampleQueries)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = trainIvfCentroids(corpus, nlist, iters, idCol, vecCol)
    val exact = bruteForceTopK(sample, corpus, k, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // geometric probe ladder: recall(nprobe) is monotone, so the
      // first rung reaching target is within 2× of optimal
      val ladder = Iterator.iterate(1)(_ * 2).takeWhile(_ < nlist)
        .toSeq :+ nlist
      var best: (Int, Double) = (nlist, 1.0)
      val found = ladder.iterator.map { np =>
        val r = recallAtK(
          ivfTopK(sample, corpus, k, nlist, np, iters, idCol, vecCol,
            centroids = Some(cents)), exact)
        (np, r)
      }.find(_._2 >= targetRecall)
      best = found.getOrElse((nlist, 1.0))
      (best._1, best._2, cents)
    } finally { sample.unpersist(); exact.unpersist(); () }
  }

  /** Symmetric int8 quantization audit — the storage-size lever for
    * embedding tables at 100 TB (float32 → 1 byte/dim + one scale per
    * vector, 4× smaller scans for the ANN coarse pass). Per vector:
    * scale = max|x|/127, q_i = clamp(round(x_i/scale)), and the audit
    * stats downstream jobs gate on (reconstruction MSE, max abs
    * error, original norm). Map-only — no shuffle; the quantized
    * array itself stays internal here and the stats are the verified
    * output (the oracle recomputes them element-identically). */
  def quantizeInt8Stats(emb: DataFrame, idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val v = asDoubles(col(vecCol))
    val scale = array_max(transform(v, x => abs(x))) / 127.0
    val errs = transform(v, x =>
      when(col("scale") === 0.0, lit(0.0)).otherwise(
        x - greatest(lit(-127.0), least(lit(127.0), round(x / col("scale"))))
          * col("scale")))
    emb
      .withColumn("scale", scale)
      .withColumn("__errs", errs)
      .select(
        col(idCol),
        round(col("scale"), 9).as("scale"),
        round(sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x)), 6)
          .as("l2_norm"),
        round(aggregate(col("__errs"), lit(0.0), (acc, e) => acc + e * e)
          / size(col(vecCol)), 12).as("mse"),
        round(array_max(transform(col("__errs"), e => abs(e))), 9)
          .as("max_abs_err"))
      .orderBy(col(idCol))
  }
}
