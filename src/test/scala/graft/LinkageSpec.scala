package graft

import graft.operators.Linkage
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("delNeighborhood is the string plus each 1-deletion variant") {
    val got = Seq("abc").toDF("s")
      .select(Linkage.delNeighborhood(col("s")).as("v"))
      .head().getSeq[String](0).toSet
    assert(got == Set("abc", "bc", "ac", "ab"))
    val empty = Seq("").toDF("s")
      .select(Linkage.delNeighborhood(col("s")).as("v"))
      .head().getSeq[String](0).toSet
    assert(empty == Set(""))
  }

  test("fuzzyJoinEd1 equals brute-force levenshtein <= 1") {
    // covers: deletion, insertion (front/back), substitution, exact
    // match, transposition (distance 2 -> excluded), and no-match
    val clean = Seq((1L, "alpha"), (2L, "bravo"), (3L, "charlie"),
      (4L, "delta"), (5L, "echo")).toDF("id", "name")
    val dirty = Seq((10L, "alpa"), (11L, "bravos"), (12L, "xcharlie"),
      (13L, "dleta"), (14L, "zulu"), (15L, "echo"), (16L, "alpha"),
      (17L, "belta")).toDF("id", "name")
    val got = Linkage.fuzzyJoinEd1(clean, "id", "name",
        dirty, "id", "name")
      .select(col("l_id"), col("r_id"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    val brute = clean.toDF("lid", "lname")
      .crossJoin(dirty.toDF("rid", "rname"))
      .withColumn("d", levenshtein(col("lname"), col("rname")))
      .where(col("d") <= 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(4)))
      .toSet
    assert(got == brute)
    assert(got.contains((1L, 10L, 1)) && got.contains((5L, 15L, 0)))
    assert(!got.exists(_._2 == 13L), "transposition is distance 2")
  }

  test("delNeighborhoodK(2) is the <=2-deletion set") {
    val got = Seq("abcd").toDF("s")
      .select(Linkage.delNeighborhoodK(col("s"), 2).as("v"))
      .head().getSeq[String](0).toSet
    val expected = Set("abcd", // 0 deletions
      "bcd", "acd", "abd", "abc", // 1 deletion
      "cd", "bd", "bc", "ad", "ac", "ab") // 2 deletions
    assert(got == expected)
  }

  test("fuzzyJoinEd(2) equals brute-force levenshtein <= 2") {
    // distances planted at 0, 1, 2 (two subs; sub+del; transposition
    // = 2), and 3 (excluded)
    val clean = Seq((1L, "alpha"), (2L, "bravo"), (3L, "charlie"),
      (4L, "delta")).toDF("id", "name")
    val dirty = Seq((10L, "alpha"), (11L, "alpba"), (12L, "alpb"),
      (13L, "bravvoo"), (14L, "chrlie"), (15L, "dleta"), (16L, "detla"),
      (17L, "xxxta"), (18L, "zulu")).toDF("id", "name")
    val got = Linkage.fuzzyJoinEd(clean, "id", "name",
        dirty, "id", "name", maxDist = 2)
      .select(col("l_id"), col("r_id"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    val brute = clean.toDF("lid", "lname")
      .crossJoin(dirty.toDF("rid", "rname"))
      .withColumn("d", levenshtein(col("lname"), col("rname")))
      .where(col("d") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(4)))
      .toSet
    assert(got == brute)
    assert(got.contains((4L, 15L, 2)) && got.contains((4L, 16L, 2)),
      "transpositions cost 2 and must be found")
    assert(!got.exists(_._2 == 18L))
  }

  test("the candidate budget gate estimates pair volume from key " +
    "frequencies: a tight budget refuses with the short-string " +
    "guidance, a generous one changes nothing") {
    val clean = Seq((1L, "alpha"), (2L, "bravo"), (3L, "ax"),
      (4L, "by")).toDF("id", "name")
    val dirty = Seq((10L, "alpha"), (11L, "xy"), (12L, "ab"))
      .toDF("id", "name")
    val e = intercept[IllegalArgumentException](
      Linkage.fuzzyJoinEd(clean, "id", "name", dirty, "id", "name",
        maxDist = 2, maxCandidateBudget = Some(1L)))
    assert(e.getMessage.contains("candidate pairs") &&
      e.getMessage.contains("salting"), e.getMessage)
    val gated = Linkage.fuzzyJoinEd(clean, "id", "name",
        dirty, "id", "name", maxDist = 2,
        maxCandidateBudget = Some(1000000L))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    val ungated = Linkage.fuzzyJoinEd(clean, "id", "name",
        dirty, "id", "name", maxDist = 2)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(gated == ungated && gated.nonEmpty)
  }

  test("deletionHashes equals xxhash64 over the declarative " +
    "deletion neighborhood, for k = 1 and 2, including multi-byte " +
    "codepoints and degenerate lengths") {
    val inputs = Seq("abcd", "a", "", "ab", "héllo", "日本語abc",
      "Customer#000000042")
    for (k <- Seq(1, 2); s <- inputs) {
      val fused = Seq(s).toDF("s")
        .select(graft.plans.TextHashExpressions
          .deletionHashes(col("s"), k).as("h"))
        .head().getSeq[Long](0)
      val declarative = Seq(s).toDF("s")
        .select(Linkage.delNeighborhoodK(col("s"), k).as("v"))
        .select(explode(col("v")).as("v"))
        .select(xxhash64(col("v")).as("h"))
        .collect().map(_.getLong(0)).toSet
      assert(fused.toSet == declarative, s"k=$k s='$s'")
      assert(fused == fused.sorted && fused.distinct == fused,
        s"sorted distinct contract: k=$k s='$s'")
    }
  }

  test("fuzzy_join plan has no cartesian product") {
    val clean = Seq((1L, "alpha")).toDF("id", "name")
    val plan = Linkage.fuzzyJoinEd1(clean, "id", "name",
      clean, "id", "name").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
