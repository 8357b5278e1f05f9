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

  /** Train `nMerges` BPE merges from a document frame (column `text`,
    * single-space tokenized). Deterministic: ties on pair count break by
    * (a, b) lexicographic order. Stops early when no adjacent pair occurs
    * twice. */
  def trainMerges(docs: DataFrame, nMerges: Int): Seq[(String, String)] = {
    val spark = docs.sparkSession
    var dict = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("toks", split(col("word"), ""))
      .select("cnt", "toks")
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
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
        // the plan superlinearly (same failure class as q39's CC rounds)
        if (round % 8 == 0) dict = dict.localCheckpoint()
      }
    }
    merges.toSeq
  }
}
