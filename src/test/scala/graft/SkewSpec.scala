package graft

import graft.operators.Skew
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedJoin is row-identical to the plain join") {
    val sf = "/root/testdata/sf0.001"
    val lineitem = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val orders = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_orderpriority")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = lineitem.join(orders, Seq("l_orderkey"))
    val salted = Skew.saltedJoin(lineitem, orders, Seq("l_orderkey"),
      salts = 8, saltBy = struct(col("l_orderkey"), col("l_linenumber")))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("skewedDistinctCount matches exact distinct counts") {
    val sf = "/root/testdata/sf0.001"
    val li = Tables.load(spark, sf, "lineitem")
    val exact = li.groupBy("l_orderkey")
      .agg(count_distinct(col("l_suppkey")).as("n_distinct"))
    val salted = Skew.skewedDistinctCount(li, Seq("l_orderkey"),
      "l_suppkey", salts = 16)
    assert(salted.join(exact.withColumnRenamed("n_distinct", "ref"),
      "l_orderkey").filter(col("n_distinct") =!= col("ref")).count() == 0)
    assert(salted.count() == exact.count())
  }
}
