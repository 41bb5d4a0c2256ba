package graft

import graft.functions._
import graft.plans.FloatVectorExpressions.{floatDot, floatNorm}
import org.apache.spark.sql.functions._

class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("native FloatDotProduct is bit-equal to the declarative fold") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val both = emb.select(
      dotProduct(col("embedding"), col("embedding")).as("fold"),
      floatDot(col("embedding"), col("embedding")).as("native"),
      l2Norm(col("embedding")).as("foldn"),
      floatNorm(col("embedding")).as("nativen"))
      .collect()
    assert(both.length == 500)
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // bit-exact
      assert(r.getDouble(2) == r.getDouble(3))
    }
  }

  test("native SrpBuckets matches the declarative hyperplane formula") {
    import graft.plans.FloatVectorExpressions.srpBuckets
    val bits = 4; val tables = 3
    // reference formulation: interpreted HOF fold per (table, plane)
    def refBucket(vec: org.apache.spark.sql.Column, table: Int) = {
      val dims = size(vec)
      (0 until bits).map { p =>
        val dot = aggregate(
          zip_with(asDoubles(vec),
            transform(sequence(lit(0), dims - 1),
              j => (pmod(xxhash64(j, lit(table * 97 + p)), lit(2000001L))
                - 1000000L) / 1000000.0),
            _ * _),
          lit(0.0), _ + _)
        when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    }
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val rows = emb.select(
      srpBuckets(col("embedding"), bits, tables).as("native"),
      array((0 until tables).map(t => refBucket(col("embedding"), t)): _*)
        .as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("native dot handles nulls and empty arrays") {
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(3f, 4f))),
      (None, Some(Array(1f))),
      (Some(Array.empty[Float]), Some(Array.empty[Float]))
    ).toDF("a", "b")
    val out = df.select(floatDot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 0.0)
  }
}
