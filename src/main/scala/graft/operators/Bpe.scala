package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained byte-pair encoding (Sennrich, Haddow, Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * deterministic and rand()-free.
  *
  * Training operates on the WORD-FREQUENCY DICTIONARY, not the corpus: one
  * corpus scan builds (word, count), and every merge round then runs on
  * that vocabulary-sized frame — the standard trick that makes BPE
  * training corpus-size-independent (a 100 TB corpus has a ~10M-entry word
  * dict). Each round is one Spark job: explode adjacent token pairs
  * weighted by word count, hash-agg, distributed TakeOrdered(1) for the
  * argmax with a total deterministic tie-break (count DESC, pair ASC).
  * Lineage is re-based by localCheckpoint every few rounds (the
  * ConnectedComponents lesson — iterative withColumn otherwise compounds
  * the plan).
  *
  * The trained merge units feed [[Subword]] greedy longest-match
  * application at corpus scale; [[tokenizeColumn]] applies merges in
  * learned order (exact BPE application) for bounded uses and specs.
  */
object Bpe {

  /** one left-to-right, non-overlapping application of merge (a, b) →
    * "ab" to a token-array column (the standard BPE apply step). */
  def applyMerge(toks: Column, a: String, b: String): Column =
    aggregate(toks, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
        element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** exact merge-order BPE tokenization of a word column — `merges`
    * applied sequentially. Expression size grows with merges.size; use for
    * specs/bounded frames, and greedy [[Subword]] application (with
    * [[vocabOf]]) for corpus-scale tokenization. */
  def tokenizeColumn(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(split(word, ""): Column) { case (t, (a, b)) =>
      applyMerge(t, a, b)
    }

  /** the subword units a merge table induces, grouped by length for the
    * greedy segmenter. */
  def vocabOf(merges: Seq[(String, String)]): Subword.Vocab =
    merges.map { case (a, b) => a + b }.distinct
      .groupBy(_.length).toSeq.sortBy(-_._1)
      .map { case (l, us) => l -> us }
      .filter(_._1 >= 2)

  /** In-memory BPE trainer over a word-frequency dictionary — the
    * production path. One pass builds pair counts and a pair→words index;
    * each merge then touches only the words that contain the chosen pair,
    * with a lazy-invalidation max-heap for the argmax (the standard
    * trainer structure — HuggingFace tokenizers / SentencePiece do the
    * same). Cost is O(total token updates + heap churn), ~ms per merge —
    * vs one Spark job (~0.3 s) per merge for [[trainMerges]]'s
    * re-aggregate-everything shape, which made a real 32k-merge vocab a
    * 2.7 h driver loop.
    *
    * Semantics are EXACTLY [[trainMerges]]: overlapping adjacent pairs all
    * count ("aaa" contributes (a,a) twice), merges apply left-to-right
    * non-overlapping, argmax ties break (count DESC, a ASC, b ASC), stop
    * when no pair occurs twice. Parity is spec-pinned.
    */
  def trainDict(dictIn: Iterator[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    // sort for determinism: heap insert order must not depend on partition
    // iteration order (ties are fully broken by the ordering, but a stable
    // walk makes debugging reproducible too)
    val dict = dictIn.toArray.sortBy(_._1)
    // explicit code-point segmentation, so the initial tokens match
    // Spark's split(word, "") (one token per code point, surrogate pairs
    // intact) by construction rather than by the regex engine's
    // zero-width-match advancement rules — JDK-independent and obvious
    // to audit (SubwordSpec's U+10000 fixture pins the parity)
    def codePointTokens(w: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        out += w.substring(i, i + n)
        i += n
      }
      out.toArray
    }
    val words: Array[Array[String]] = dict.map(d => codePointTokens(d._1))
    val cnts: Array[Long] = dict.map(_._2)
    type Pair = (String, String)
    val pairCnt = mutable.HashMap.empty[Pair, Long]
    // inverted index pair → word ids as a flat int buffer, NOT a BitSet:
    // a BitSet's backing array spans up to the LARGEST id added, so one
    // rare pair seen once at word 10^6 costs 125 KB — at a real 10^6-word
    // dict the index OOMed 32 GB (r9). A buffer costs memory proportional
    // to actual incidences; duplicate ids (same pair twice in one word,
    // or re-added after a merge) are safe because the merge loop
    // rechecks containment against the live word before applying.
    val pairWords = mutable.HashMap.empty[Pair, mutable.ArrayBuffer[Int]]
    def addIncidence(p: Pair, wi: Int): Unit = {
      val buf = pairWords.getOrElseUpdate(p, mutable.ArrayBuffer.empty[Int])
      if (buf.isEmpty || buf(buf.length - 1) != wi) buf += wi
    }
    def pairsOf(toks: Array[String]): Iterator[Pair] =
      if (toks.length < 2) Iterator.empty
      else (0 until toks.length - 1).iterator.map(i => (toks(i), toks(i + 1)))
    var w = 0
    while (w < words.length) {
      for (p <- pairsOf(words(w))) {
        pairCnt.updateWith(p) { c => Some(c.getOrElse(0L) + cnts(w)) }
        addIncidence(p, w)
      }
      w += 1
    }
    // max-heap: count DESC, then (a, b) lexicographic ASC — Reverse on the
    // string legs turns PriorityQueue's max into lexicographic min.
    // The string legs compare UTF-8 BYTES, not java.lang.String UTF-16
    // code units: the distributed trainMerges breaks ties through Spark's
    // orderBy, which is UTF8String binary order, and the two differ for
    // supplementary-plane tokens vs [U+E000,U+FFFF] (0xFFFF > 0xD800 in
    // UTF-16 but EF BF BF < F0 90 80 80 in UTF-8) — String ordering here
    // would let the trainers diverge at exactly such a tie.
    val utf8Order: Ordering[String] = (x: String, y: String) => {
      val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(a.length, b.length)
      var c = 0
      while (c == 0 && i < n) { c = (a(i) & 0xff) - (b(i) & 0xff); i += 1 }
      if (c != 0) c else a.length - b.length
    }
    implicit val ord: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering.Long, utf8Order.reverse, utf8Order.reverse)
    val heap = mutable.PriorityQueue.empty[(Long, String, String)]
    pairCnt.foreach { case ((a, b), c) => if (c >= 2) heap.enqueue((c, a, b)) }
    def applyTo(toks: Array[String], a: String, b: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
          out += a + b; i += 2
        } else { out += toks(i); i += 1 }
      }
      out.toArray
    }
    val merges = mutable.ArrayBuffer.empty[Pair]
    var done = false
    while (!done && merges.length < nMerges) {
      // lazy invalidation: stale heap entries (count changed since push)
      // are discarded on pop by checking against the live map
      var top: Option[(Long, String, String)] = None
      while (top.isEmpty && heap.nonEmpty) {
        val t = heap.dequeue()
        if (pairCnt.get((t._2, t._3)).contains(t._1) && t._1 >= 2) top = Some(t)
      }
      top match {
        case None => done = true
        case Some((_, a, b)) =>
          merges += ((a, b))
          val touched = mutable.HashSet.empty[Pair]
          for (wi <- pairWords.getOrElse((a, b), mutable.ArrayBuffer.empty[Int])) {
            val before = words(wi)
            // the index is lazily stale-tolerant: a word may no longer
            // contain the pair (an earlier merge consumed it) — recheck
            var contains = false
            var i = 0
            while (!contains && i + 1 < before.length) {
              contains = before(i) == a && before(i + 1) == b; i += 1
            }
            if (contains) {
              val after = applyTo(before, a, b)
              for (p <- pairsOf(before)) {
                pairCnt.updateWith(p)(c => Some(c.getOrElse(0L) - cnts(wi)))
                touched += p
              }
              for (p <- pairsOf(after)) {
                pairCnt.updateWith(p)(c => Some(c.getOrElse(0L) + cnts(wi)))
                addIncidence(p, wi)
                touched += p
              }
              words(wi) = after
            }
          }
          for (p <- touched) {
            val c = pairCnt.getOrElse(p, 0L)
            if (c <= 0) { pairCnt.remove(p); pairWords.remove(p) }
            else if (c >= 2) heap.enqueue((c, p._1, p._2))
          }
      }
    }
    merges.toSeq
  }

  /** Train `nMerges` merges with the corpus scan distributed and the
    * in-memory trainer ([[trainDict]]) in ONE executor task: the
    * word-frequency dict is vocabulary-sized (corpus-size-independent,
    * ~10M entries even at 100 TB), so it fits a single task comfortably,
    * and the driver receives only the merge table. */
  def trainMergesFast(docs: DataFrame, nMerges: Int): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        trainDict(it, nMerges).iterator.zipWithIndex
          .map { case ((a, b), i) => (i, a, b) }
      }
      .collect()
      .sortBy(_._1)
      .map { case (_, a, b) => (a, b) }
      .toSeq
  }

  /** Train `nMerges` BPE merges from a document frame (column `text`,
    * single-space tokenized). Deterministic: ties on pair count break by
    * (a, b) lexicographic order. Stops early when no adjacent pair occurs
    * twice.
    *
    * One Spark job PER MERGE — kept as the distributed-argmax reference
    * the parity spec checks [[trainMergesFast]] against; use the fast
    * path for real vocab sizes. */
  def trainMerges(docs: DataFrame, nMerges: Int): Seq[(String, String)] = {
    val spark = docs.sparkSession
    var dict = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("toks", split(col("word"), ""))
      .select("cnt", "toks")
      .transform(graft.util.Checkpoints.ckpt(_, true))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // the initial dict checkpoint is generation 0 — retired like the rest
    var lastCkpt: Option[DataFrame] = Some(dict)
    var done = false
    var round = 0
    while (!done && round < nMerges) {
      val top = dict.filter(size(col("toks")) > 1)
        .select(col("cnt"), explode(
          transform(sequence(lit(1), size(col("toks")) - 1), i =>
            struct(element_at(col("toks"), i).as("a"),
              element_at(col("toks"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .filter(col("c") >= 2)
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        dict = dict.withColumn("toks", applyMerge(col("toks"), a, b))
        round += 1
        // re-base lineage: 30 stacked HOF-fold projections otherwise grow
        // the plan superlinearly (same failure class as q39's CC rounds);
        // routed through the shared strategy so a cluster deployment gets
        // reliable files instead of lost-executor-fatal blocks (r15).
        // r16 (ADVICE r15): retire the previous round's checkpoint once
        // the new one has materialized (ckpt here is eager), as CC does —
        // otherwise each re-base leaves blocks (local) or an rdd-<id> dir
        // (reliable) alive for the session lifetime.
        if (round % 8 == 0) {
          val prev = lastCkpt
          dict = graft.util.Checkpoints.ckpt(dict, true)
          lastCkpt = Some(dict)
          prev.foreach(p =>
            org.apache.spark.sql.graftshim.CheckpointShim.unpersistCheckpoint(p))
        }
      }
    }
    merges.toSeq
  }
}
