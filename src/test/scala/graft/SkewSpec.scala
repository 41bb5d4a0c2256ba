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

  test("adaptiveSaltedJoin salts only hot keys and stays row-identical") {
    import spark.implicits._
    // key 1 is hot (200 rows), keys 2..20 are cold (1 row each)
    val fact = ((1 to 200).map(i => (1L, i.toLong)) ++
      (2 to 20).map(k => (k.toLong, 0L))).toDF("k", "row_id")
    val dim = (1 to 25).map(k => (k.toLong, s"attr$k")).toDF("k", "attr")
    val plain = fact.join(dim, Seq("k"))
    val adaptive = Skew.adaptiveSaltedJoin(fact, dim, Seq("k"),
      salts = 8, saltBy = col("row_id"), hotThreshold = 100L)
    assert(adaptive.count() == plain.count())
    assert(adaptive.exceptAll(plain).isEmpty &&
      plain.exceptAll(adaptive).isEmpty)
    // the hot key really spreads over multiple salt buckets, cold
    // keys pay nothing (exactly one replica each in the dim side)
    val hotSalts = fact.filter(col("k") === 1L)
      .select(pmod(xxhash64(col("row_id")), lit(8)).cast("int").as("s"))
      .distinct().count()
    assert(hotSalts > 1)
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
