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
