package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Subword (BPE-style) tokenization — the unit a pretraining pipeline
  * actually budgets by. Two pieces:
  *
  *   1. A GREEDY LONGEST-MATCH segmenter over a subword vocabulary
  *      (WordPiece-style application; Schuster & Nakajima 2012, and the
  *      application mode of Sennrich et al. 2016's BPE vocabularies).
  *      Deterministic pure string/integer arithmetic — no FP — so a DuckDB
  *      oracle replays it bit-for-bit (recursive CTE; the Spark side is an
  *      integer HOF fold). Segmentation runs on DISTINCT words only and
  *      joins back to the token stream: at 100 TB the expensive per-word
  *      loop touches the vocabulary-sized word dictionary, never the
  *      corpus-sized token stream.
  *
  *   2. A corpus BPE TRAINER ([[Bpe]]) that learns merge rules from the
  *      word-frequency dictionary; its resulting units can be fed back in
  *      here as the vocabulary (`glen(word, vocab)`).
  *
  * The default vocabulary is FIXTURE-BAKED public knowledge: the most
  * frequent English character bigrams/trigrams/quadgrams (standard
  * frequency tables, e.g. Norvig's corpus counts) — not trained on the
  * test corpus. Single characters are always implicit fallback units, so
  * segmentation total-covers any word.
  */
object Subword {

  /** Fixture subword units by length (2..4). Frequency-ranked common
    * English character n-grams — public linguistic reference data. */
  val units2: Seq[String] = Seq(
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd", "ti", "es",
    "or", "te", "of", "ed", "is", "it", "al", "ar", "st", "to", "nt", "ng",
    "se", "ha", "as", "ou", "io", "le", "ve", "co", "me", "de", "hi", "ri",
    "ro", "ic", "ne", "ea", "ra", "ce", "li", "ch", "ll", "be", "ma", "si",
    "om", "ur", "ca", "el", "ta", "la", "ns", "di", "fo", "ho", "pe", "ec",
    "pr", "no", "ct", "us", "ac", "ot", "il", "tr", "ly", "nc", "et", "ut",
    "ss", "so", "rs", "un", "lo", "wa", "ge", "ie", "wh", "ee", "wi", "em",
    "ad", "ol", "rt", "po", "we", "na", "ul", "ni", "ts", "mo", "ow", "pa",
    "im", "mi", "ai", "sh", "ir", "su", "id", "os", "iv", "ia", "am", "fi",
    "ci", "vi", "pl", "ig", "tu", "ev", "ld", "ry", "mp", "fe", "bl", "ab",
    "gh", "ty", "op", "wo", "sa", "ay", "ex", "ke", "fr", "oo", "av", "ag",
    "if", "ap", "gr", "od", "bo", "sp", "rd", "do", "uc", "bu", "ei", "ov",
    "by", "qu")

  val units3: Seq[String] = Seq(
    "the", "and", "ing", "ion", "tio", "ent", "ati", "for", "her", "ter",
    "hat", "tha", "ere", "ate", "his", "con", "res", "ver", "all", "ons",
    "nce", "men", "ith", "ted", "ers", "pro", "thi", "wit", "are", "ess",
    "not", "ive", "was", "ect", "rea", "com", "eve", "per", "int", "est",
    "sta", "cti", "ica", "ist", "ear", "ain", "one", "our", "iti", "rat")

  val units4: Seq[String] = Seq(
    "tion", "atio", "that", "ther", "with", "ment", "ions", "this", "here",
    "from", "ould", "ting", "hich", "ence", "ight", "ough", "ance", "ture",
    "sion", "ound")

  /** vocabulary grouped by unit length, longest first. */
  type Vocab = Seq[(Int, Seq[String])]

  val defaultVocab: Vocab =
    Seq(4 -> units4, 3 -> units3, 2 -> units2)

  // ---------------------------------------------------------------- Scala
  // reference segmentation (specs + driver-side uses)

  private def toSet(v: Vocab): Seq[(Int, Set[String])] =
    v.sortBy(-_._1).map { case (l, us) => l -> us.toSet }

  /** greedy longest-match segmentation of one word (pure reference). */
  def segment(word: String, vocab: Vocab = defaultVocab): Seq[String] = {
    val vs = toSet(vocab)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < word.length) {
      val hit = vs.collectFirst {
        case (l, us) if pos + l <= word.length && us(word.substring(pos, pos + l)) =>
          word.substring(pos, pos + l)
      }
      val tok = hit.getOrElse(word.substring(pos, pos + 1))
      out += tok
      pos += tok.length
    }
    out.toSeq
  }

  // ---------------------------------------------------------------- Spark

  /** per-position greedy match length for `word` — longest vocab unit
    * starting at 1-based position i, else 1. substr past the end yields a
    * short string that cannot equal a longer unit, in both engines. */
  private[graft] def glens(word: Column, vocab: Vocab): Column =
    transform(sequence(lit(1), length(word)), i =>
      toSet(vocab).foldRight(lit(1): Column) { case ((l, us), els) =>
        when(word.substr(i, lit(l)).isin(us.toSeq.sorted: _*), lit(l)).otherwise(els)
      })

  /** greedy subword-token COUNT of a word column: integer fold over the
    * per-position match lengths with skip-encoded state
    * (acc = chars_still_covered * 10^9 + tokens_so_far) — pure integer
    * arithmetic, so any engine computing greedy segmentation agrees
    * exactly. The 10^9 stride keeps the encoding collision-free for any
    * word up to a billion chars (token count ≤ word length < stride;
    * skip ≤ 3 < stride trivially). Empty words count 0 (guards Spark's
    * descending sequence(1,0)). */
  private val FoldStride = 1000000000L

  def countCol(word: Column, vocab: Vocab = defaultVocab): Column =
    when(length(word) === 0, lit(0)).otherwise(
      aggregate(glens(word, vocab), lit(0L), (acc, g) =>
        when(acc >= FoldStride, acc - FoldStride)
          .otherwise((g.cast("long") - 1L) * FoldStride + acc + 1L))
        .cast("int"))

  /** the greedy segmentation ITSELF as an array column — the fold over
    * `glensCol` (a precomputed [[glens]] array, bound once so the match
    * tree isn't duplicated per lambda reference) that keeps only segment
    * STARTS: the accumulator carries (next-start, units-so-far) and a
    * position contributes exactly when it equals the next start. Pure
    * string/integer arithmetic — the oracle's recursive walk emits the
    * same tokens. Runs on DISTINCT words only (vocabulary-sized). */
  def unitsCol(word: Column, glensCol: Column): Column = {
    val empty = array().cast("array<string>")
    when(length(word) === 0, empty).otherwise(
      aggregate(
        sequence(lit(1), length(word)),
        struct(lit(1).cast("int").as("next"), empty.as("us")),
        (acc, p) => when(p === acc("next"),
            struct((p + element_at(glensCol, p)).cast("int").as("next"),
              concat(acc("us"),
                array(word.substr(p, element_at(glensCol, p)))).as("us")))
          .otherwise(acc),
        acc => acc("us")))
  }

  /** (doc_id, n_words, n_subwords, max_word_subwords) per document:
    * segmentation on DISTINCT words (vocabulary-sized), joined back to the
    * exploded token stream (corpus-sized but join + hash-agg only). */
  def docCounts(docs: DataFrame, vocab: Vocab = defaultVocab): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val dw = tok.select("word").distinct()
      .withColumn("n_sub", countCol(col("word"), vocab))
    tok.join(dw, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_words"),
        sum(col("n_sub")).cast("long").as("n_subwords"),
        max(col("n_sub")).cast("int").as("max_word_subwords"))
  }

  // --------------------------------------------------------------- oracle

  private def sqlList(us: Seq[String]): String =
    us.sorted.map(u => s"'$u'").mkString("(", ", ", ")")

  /** DuckDB expression: greedy match length at position `pos` of `word`. */
  def glenSql(word: String, pos: String, vocab: Vocab = defaultVocab): String =
    toSet(vocab).foldRight("1") { case ((l, us), els) =>
      s"CASE WHEN substr($word, $pos, $l) IN ${sqlList(us.toSeq)} THEN $l ELSE $els END"
    }

  /** DuckDB CTEs (for a `WITH RECURSIVE` clause): `dw` distinct words,
    * `seg` the greedy walk (recursion depth = tokens per word), `sw`
    * (word, n_sub), `tokj` the corpus token stream. Joining tokj with sw
    * gives per-token subword counts. */
  def oracleCtes(vocab: Vocab = defaultVocab): String =
    s"""dw AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS word FROM documents),
       |seg AS (
       |  SELECT word, 1 AS pos, 0 AS ntok FROM dw
       |  UNION ALL
       |  SELECT word, pos + ${glenSql("word", "pos", vocab)}, ntok + 1
       |  FROM seg WHERE pos <= len(word)),
       |sw AS (SELECT word, MAX(ntok) AS n_sub FROM seg GROUP BY word),
       |tokj AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)""".stripMargin

  /** [[oracleCtes]] with the recursion EMITTING each token (`units` is
    * the per-word segment multiset — one row per unit occurrence), for
    * queries about the segments themselves rather than their counts. */
  def oracleSegCtes(vocab: Vocab = defaultVocab): String =
    s"""dw AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS word FROM documents),
       |seg AS (
       |  SELECT word, 1 AS pos, CAST(NULL AS VARCHAR) AS tok FROM dw
       |  UNION ALL
       |  SELECT word, pos + ${glenSql("word", "pos", vocab)},
       |         substr(word, pos, ${glenSql("word", "pos", vocab)})
       |  FROM seg WHERE pos <= len(word)),
       |units AS (SELECT word, tok FROM seg WHERE tok IS NOT NULL),
       |tokj AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)""".stripMargin
}
