package graft

import graft.operators.{AnnIndex, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-6 persisted ANN index: build/probe split over partitioned
  * parquet — probes must not re-bucket (re-hash) the corpus. */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ann").toString

  test("persisted IVF probe equals the in-memory path on the same " +
    "centroid model") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(pmod(col("vec_id"), lit(25)) === 0)
    val path = tmp()
    AnnIndex.buildIvf(emb, path, nlist = 16, iters = 3)
    val cents = AnnIndex.loadIvfCentroids(spark, path)
    assert(cents.length == 16)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "cosine")
        .as[(Long, Long, Long, Double)].collect().toSet
    val probed = rows(AnnIndex.ivfProbe(spark, path, queries, k = 5,
      nprobe = 6))
    val inMem = rows(Similarity.ivfTopK(queries, emb, 5, nlist = 16,
      nprobe = 6, centroids = Some(cents)))
    assert(probed == inMem)
    assert(probed.nonEmpty)
  }

  test("IVF probe runs the centroid kernel on the query side ONLY — " +
    "the corpus scan reads the index, un-re-hashed") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(pmod(col("vec_id"), lit(25)) === 0)
    val path = tmp()
    AnnIndex.buildIvf(emb, path, nlist = 8, iters = 2)
    val probeDf = AnnIndex.ivfProbe(spark, path, queries, k = 5, nprobe = 3)
    val plan = probeDf.queryExecution.executedPlan.toString
    // the corpus side is a plain FileScan of the index with the cell
    // id and norm PRE-computed — the assignment kernel never touches
    // corpus rows again
    assert(plan.contains("FileScan parquet [vec_id"), plan.take(1200))
    assert("FileScan[^\\n]*cid".r.findFirstIn(plan).isDefined,
      plan.take(1200))
    // the in-memory formulation runs the kernel on BOTH sides — the
    // probe plan must apply it strictly fewer times (query side only;
    // plan strings may repeat an expression across Generate/Project)
    val cents = AnnIndex.loadIvfCentroids(spark, path)
    val inMemPlan = Similarity.ivfTopK(queries, emb, 5, nlist = 8,
      nprobe = 3, centroids = Some(cents))
      .queryExecution.executedPlan.toString
    def kernels(p: String) = "topcentroids".r.findAllIn(p.toLowerCase).size
    assert(kernels(plan) < kernels(inMemPlan),
      s"probe=${kernels(plan)} inMem=${kernels(inMemPlan)}")
  }

  test("persisted LSH probe equals the in-memory path; buckets prune") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(pmod(col("vec_id"), lit(25)) === 0)
    val path = tmp()
    AnnIndex.buildLsh(emb, path, bits = 4, tables = 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "cosine")
        .as[(Long, Long, Long, Double)].collect().toSet
    val probed = rows(AnnIndex.lshProbe(spark, path, queries, k = 5,
      bits = 4, tables = 8))
    val inMem = rows(Similarity.lshTopK(queries, emb, 5, bits = 4,
      tables = 8))
    assert(probed == inMem)
    // srp hashing happens on the QUERY side only: in the optimized
    // plan the corpus branch is a plain relation scan of the stored
    // buckets — no Generate (bucket explode) over corpus rows; the
    // srp kernel may appear inside the branch ONLY as a
    // dynamic-partition-pruning subquery (which evaluates the small
    // query side to decide which t=/b=/ partitions to read — the
    // pruning this index exists for)
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join}
    val lp = AnnIndex.lshProbe(spark, path, queries, k = 5,
      bits = 4, tables = 8).queryExecution.optimizedPlan
    val join = lp.collectFirst { case j: Join => j }.get
    val corpusSide = Seq(join.left, join.right)
      .find(_.collectLeaves().exists(_.toString.contains("norm"))).get
    assert(corpusSide.collect { case g: Generate => g }.isEmpty,
      corpusSide.toString.take(800))
    assert(corpusSide.toString.toLowerCase.contains("dynamicpruning"),
      corpusSide.toString.take(800))
  }

  test("IVF cells partition the corpus exactly once (storage 1×)") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val path = tmp()
    AnnIndex.buildIvf(emb, path, nlist = 8, iters = 2)
    val cells = spark.read.parquet(s"$path/cells")
    assert(cells.count() == emb.count())
    assert(cells.select("vec_id").distinct().count() == emb.count())
    // every row landed in a real cell of the model
    assert(cells.select("cid").distinct().as[Int].collect()
      .forall(c => c >= 0 && c < 8))
  }
}
