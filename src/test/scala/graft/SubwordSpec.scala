package graft

import graft.operators.{Bpe, Subword}
import org.apache.spark.sql.functions._

class SubwordSpec extends SparkSpec {
  import spark.implicits._

  test("greedy segmentation reference: longest match wins, chars fall back") {
    // "the" is a 3-unit; greedy takes it whole
    assert(Subword.segment("the") == Seq("the"))
    // "that" is a 4-unit
    assert(Subword.segment("that") == Seq("that"))
    // "zq" has no 2-unit "zq" → two single chars
    assert(Subword.segment("zq") == Seq("z", "q"))
    // segmentation always reassembles the word
    Seq("customer", "windowing", "xylophone", "a", "", "spark").foreach { w =>
      assert(Subword.segment(w).mkString == w)
    }
  }

  test("countCol matches the pure reference on corpus words") {
    val words = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("word"))
      .distinct().limit(200).as[String].collect()
    val got = words.toSeq.toDF("word")
      .select(col("word"), Subword.countCol(col("word")).as("n"))
      .as[(String, Int)].collect().toMap
    words.foreach { w =>
      assert(got(w) == Subword.segment(w).length, s"word '$w'")
    }
  }

  test("countCol: empty word counts 0, bounds hold, very long words don't alias") {
    val long = "z" * 200000 // no 2+-unit starts with z → 200k single chars
    val df = Seq("", "a", "the", "abcdefgh", long).toDF("word")
      .select(col("word"), Subword.countCol(col("word")).as("n"))
      .as[(String, Int)].collect().toMap
    assert(df("") == 0)
    assert(df("a") == 1)
    assert(df("the") == 1)
    // count is between ceil(len/maxUnit) and len
    assert(df("abcdefgh") >= 2 && df("abcdefgh") <= 8)
    // the skip-encoded fold must survive counts past the old 1e5 stride
    assert(df(long) == 200000)
  }

  test("BPE trainer learns the expected first merges on a fixture corpus") {
    // corpus: "aaab" ×3, "ab" ×2 → pair counts round 1:
    //   (a,a): 2 per "aaab" ×3 = 6; (a,b): 1×3 + 1×2 = 5 → merge (a,a)
    // round 2 tokens: "aaab"→[aa,a,b], "ab"→[a,b]:
    //   (aa,a): 3; (a,b): 3+2=5 → merge (a,b)  [count desc, then lex]
    val docs = Seq("aaab aaab aaab ab ab").toDF("text")
    val merges = Bpe.trainMerges(docs, 2)
    assert(merges == Seq(("a", "a"), ("a", "b")))
  }

  test("BPE merge application is left-to-right non-overlapping") {
    val out = Seq("aaaa")
      .toDF("word")
      .select(Bpe.tokenizeColumn(col("word"), Seq(("a", "a"))).as("t"))
      .as[Seq[String]].head()
    assert(out == Seq("aa", "aa"))
  }

  test("fast trainer matches the distributed-argmax reference merge-for-merge") {
    // fixture corpora exercising ties, overlaps, and early stop
    val corpora = Seq(
      "aaab aaab aaab ab ab",
      "lower lower lowest newest newest widest wide",
      "xy xy yx yx",            // pure tie → lexicographic break
      "aaaa aaaa bbbb",         // overlap counting + self-merge chains
      "q w e r t y")            // singletons only → zero merges
    corpora.foreach { c =>
      val docs = Seq(c).toDF("text")
      val slow = Bpe.trainMerges(docs, 12)
      val fast = Bpe.trainMergesFast(docs, 12)
      assert(fast == slow, s"corpus '$c'")
    }
  }

  test("fast trainer matches the reference on real corpus words") {
    val docs = Tables.documents(spark, sf0001).limit(40)
    val slow = Bpe.trainMerges(docs, 10)
    val fast = Bpe.trainMergesFast(docs, 10)
    assert(fast == slow)
  }

  test("fast trainer breaks ties in UTF-8 byte order like Spark, not UTF-16") {
    import spark.implicits._
    // U+FFFF sorts AFTER U+10000 in Java String order (0xFFFF > 0xD800)
    // but BEFORE it in UTF-8 byte order (EF BF BF < F0 90 80 80) — a tied
    // top pair on these tokens is exactly where the two trainers could
    // diverge if the heap used String ordering
    val hi = "\uffff"
    val supp = "\ud800\udc00" // U+10000 as its surrogate pair
    val docs = Seq(s"$hi$supp $hi$supp $supp$hi $supp$hi").toDF("text")
    val slow = Bpe.trainMerges(docs, 4)
    val fast = Bpe.trainMergesFast(docs, 4)
    assert(fast == slow, s"tie-break divergence: fast=$fast slow=$slow")
  }

  test("trained merges feed the greedy segmenter as a vocab") {
    val docs = Seq("lower lower lowest newest newest").toDF("text")
    val merges = Bpe.trainMerges(docs, 6)
    assert(merges.nonEmpty)
    val vocab = Bpe.vocabOf(merges)
    // greedy segmentation under the trained vocab still reassembles words
    Seq("lower", "lowest", "newest", "low").foreach { w =>
      assert(Subword.segment(w, vocab).mkString == w)
    }
  }

  test("trained fixture vocab: 1500 merges load, segmentation is total, " +
    "non-trivial on corpus words, and countCol agrees with the reference") {
    import graft.operators.TrainedBpe
    assert(TrainedBpe.merges.length == 1500)
    val counts = Seq("spark", "table", "customer", "window", "a").map { w =>
      val segs = Subword.segment(w, TrainedBpe.vocab)
      assert(segs.mkString == w, s"segmentation must reassemble $w")
      segs.length
    }
    // disjoint training dict ⇒ corpus words split into real pieces (the
    // all-1s degenerate case would mean the fixture was corpus-seeded)
    assert(counts.count(_ > 1) >= 3, s"expected multi-unit splits, got $counts")
    // the Spark column twin agrees with the pure reference on the dict
    val dict = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("word")).distinct()
      .withColumn("n", Subword.countCol(col("word"), TrainedBpe.vocab))
      .as[(String, Int)].collect()
    dict.foreach { case (w, n) =>
      assert(n == Subword.segment(w, TrainedBpe.vocab).length, s"word $w")
    }
  }

  test("unitsCol materializes the same segmentation as the pure reference") {
    import graft.operators.TrainedBpe
    val words = Seq("spark", "customer", "window", "a", "", "sorting",
      "xyzzyqq") // last: forces single-char fallbacks
    val got = words.toDF("word")
      .withColumn("g", Subword.glens(col("word"), TrainedBpe.vocab))
      .select(col("word"), Subword.unitsCol(col("word"), col("g")).as("units"))
      .as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      assert(got(w) == Subword.segment(w, TrainedBpe.vocab),
        s"units mismatch for '$w'")
      assert(got(w).mkString == w, s"units must reassemble '$w'")
    }
  }

  test("docCounts totals are consistent with per-word reference counts") {
    val docs = Tables.documents(spark, sf0001)
    val got = Subword.docCounts(docs).orderBy("doc_id").limit(20).collect()
    val texts = docs.orderBy("doc_id").limit(20)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    got.foreach { r =>
      val words = texts(r.getLong(0)).split(" ", -1).toSeq
      assert(r.getInt(1) == words.length)
      assert(r.getLong(2) == words.map(w => Subword.segment(w).length.toLong).sum)
      assert(r.getInt(3) == words.map(w => Subword.segment(w).length).max)
    }
  }
}
