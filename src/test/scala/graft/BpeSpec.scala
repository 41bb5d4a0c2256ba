package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference BPE trainer, same tie-break
    * (count desc, left asc, right asc), greedy-left merge. */
  private def refBpe(words: Map[String, Long],
                     merges: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var stop = false
    while (r <= merges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), n) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, x, y) }
        out += ((r, a, b, n))
        def mergeWord(v: Vector[String]): Vector[String] =
          v.foldLeft(Vector.empty[String])((acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
            else acc :+ x)
        vocab = vocab.toSeq.map { case (v, f) => (mergeWord(v), f) }
          .groupMapReduce(_._1)(_._2)(_ + _)
        r += 1
      }
    }
    out.toSeq
  }

  test("train matches the sequential reference on the classic corpus") {
    // the Sennrich et al. '16 walkthrough vocabulary
    val freq = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val text = freq.toSeq.sortBy(_._1)
      .flatMap { case (w, f) => Seq.fill(f.toInt)(w) }.mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = Bpe.train(docs, merges = 8).orderBy("rank")
      .as[(Int, String, String, Long)].collect().toSeq
    val want = refBpe(freq, 8)
    assert(got == want)
    assert(got.head._4 == 9L) // ("e","s") at 6 + 3 wins round 1
  }

  test("distributed loop == driver endgame == sequential reference") {
    // localSolveMaxVocab = 0 forces the distributed per-round loop;
    // the default gate takes the driver endgame — identical output
    // on a corpus with ties, runs, and early-stopping words
    val freq = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "aaa" -> 4L, "ab" -> 1L, "x" -> 9L)
    val text = freq.toSeq.sortBy(_._1)
      .flatMap { case (w, f) => Seq.fill(f.toInt)(w) }.mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val local = Bpe.train(docs, merges = 12).orderBy("rank")
      .as[(Int, String, String, Long)].collect().toSeq
    val dist = Bpe.train(docs, merges = 12, localSolveMaxVocab = 0L)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(local == dist)
    assert(local == refBpe(freq, 12))
  }

  test("driver endgame trains a 1000-merge vocabulary in seconds") {
    // the production shape: merge count ≫ rounds a per-round
    // distributed loop could afford (≈0.5 s scheduling floor each)
    val words = (0 until 600).map(i =>
      s"w${i}abcdefgh${i % 7}xyz${i % 13}")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val table = Bpe.train(docs, merges = 1000)
      .as[(Int, String, String, Long)].collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(table.length > 100, s"expected a deep merge table, got ${table.length}")
    // ranks are dense and frequencies monotone-ish sane
    assert(table.map(_._1).toSeq == (1 to table.length))
    assert(table.forall(_._4 > 0))
    assert(secs < 60.0, s"1000-merge train took $secs s")
  }

  test("pairCounts hand-counts; greedy-left fold handles symbol runs") {
    val docs = Seq((1L, "aaa aaa ab")).toDF("doc_id", "text")
    val pc = Bpe.pairCounts(docs).orderBy("sym_a", "sym_b")
      .as[(String, String, Long)].collect().toSeq
    assert(pc == Seq(("a", "a", 4L), ("a", "b", 1L)))
    // after merging (a,a): "aaa" → [aa, a] (left-to-right), so round
    // 2's best pair is (aa, a) at the two "aaa" occurrences
    val m = Bpe.train(docs, merges = 2).orderBy("rank")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(m == Seq((1, "a", "a", 4L), (2, "aa", "a", 2L)))
  }

  /** Sequential reference encoder: rank-ordered greedy merges. */
  private def refEncode(word: String,
                        merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector
    var done = false
    while (!done && syms.length >= 2) {
      val cands = syms.indices.dropRight(1)
        .flatMap(i => rank.get((syms(i), syms(i + 1))).map((_, i)))
      if (cands.isEmpty) done = true
      else {
        val (a, b) = merges(cands.map(_._1).min)
        syms = syms.foldLeft(Vector.empty[String])((acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
          else acc :+ x)
      }
    }
    syms
  }

  test("encode matches the reference, incl. unseen words; reassembles") {
    val freq = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val corpus = freq.toSeq.sortBy(_._1)
      .flatMap { case (w, f) => Seq.fill(f.toInt)(w) }.mkString(" ")
    val docs = Seq((1L, corpus)).toDF("doc_id", "text")
    val table = Bpe.train(docs, merges = 8).orderBy("rank")
      .as[(Int, String, String, Long)].collect().toSeq
      .map(m => (m._2, m._3))
    // "lowest" is NOT in the training vocabulary
    val probe = Seq((1L, "newest lowest low"), (2L, "")).toDF("doc_id", "text")
    val got = Bpe.encode(probe, table).orderBy("doc_id")
      .as[(Long, Seq[String], Long)].collect().toSeq
    val want1 = Seq("newest", "lowest", "low").flatMap(refEncode(_, table))
    assert(got(0)._2 == want1)
    assert(got(0)._3 == want1.length.toLong)
    // encoding is lossless: tokens concatenate back to the words
    assert(got(0)._2.mkString == "newestlowestlow")
    assert(got(1)._2 == Seq.empty && got(1)._3 == 0L)
    // an empty merge table degrades to the character vocabulary
    val chars = Bpe.encode(Seq((1L, "ab c")).toDF("doc_id", "text"), Seq.empty)
      .as[(Long, Seq[String], Long)].head()
    assert(chars._2 == Seq("a", "b", "c") && chars._3 == 3L)
  }

  test("encode keeps astral code points as single symbols") {
    val emoji = new String(Character.toChars(0x1F600))
    val out = Bpe.encode(Seq((1L, emoji + "a")).toDF("doc_id", "text"),
      Seq.empty).as[(Long, Seq[String], Long)].head()
    // a surrogate pair is ONE symbol (training's split(w, "")
    // semantics), and reassembly stays lossless
    assert(out._2 == Seq(emoji, "a") && out._3 == 2L)
    assert(out._2.mkString == emoji + "a")
  }

  test("tokenCounts: trained merges compress counts below char count") {
    val docs = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "documents")
    val out = Bpe.tokenCounts(docs, merges = 4)
      .as[(Long, Long)].collect().toMap
    val chars = docs.selectExpr("doc_id",
      "cast(length(replace(text, ' ', '')) as long) AS n").as[(Long, Long)]
      .collect().toMap
    assert(out.keySet == chars.keySet)
    // merges only ever shrink the token stream, never below 1 per word
    assert(out.forall { case (id, n) => n <= chars(id) && n > 0 })
    assert(out.values.sum < chars.values.sum, "4 merges must compress")
  }

  test("train stops early when no pairs remain") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = Bpe.train(docs, merges = 5).orderBy("rank")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(m == Seq((1, "a", "b", 2L)))
  }
}
