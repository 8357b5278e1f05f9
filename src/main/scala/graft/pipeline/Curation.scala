package graft.pipeline

import graft.util.Det
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Production-shape corpus curation (the pipeline twins of declared q77 /
  * q78): benchmark decontamination against an ARBITRARY benchmark frame
  * and mixture (quota) sampling toward arbitrary target shares. The
  * declared queries pin the algorithm against DuckDB on fixed knobs
  * (13-gram window, `doc_id % 37` holdout, uniform 20% mix); these APIs
  * are the same plans with the knobs as parameters, returning the frames
  * a pipeline consumes (contaminated-doc list, sampled corpus).
  */
object Curation {

  /** Word n-gram md5 digests of `textCol`, one row per (id, gram digest).
    * Digests travel, never n-word strings — the shuffle and join keys are
    * 32-char hex. */
  private def gramHashes(df: DataFrame, idCol: String, textCol: String,
                         n: Int): DataFrame = {
    val w = split(col(textCol), " ")
    val grams = element_at(transform(array(w), wb =>
      when(size(wb) >= n, transform(sequence(lit(1), size(wb) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(wb, i + o)): _*)))
        .otherwise(array())), 1)
    df.select(col(idCol), explode(grams).as("g"))
      .select(col(idCol), md5(col("g")).as("gh"))
  }

  /** Contaminated-training-doc report: every `train` doc sharing at least
    * one word-`n`-gram with any `bench` doc, with distinct shared-gram /
    * benchmark-doc counts and the contamination fraction. Both inputs
    * need (`doc_id`, `text`). Scale shape = q77's: digest hash join
    * against the DISTINCT benchmark side, distinct hash-aggs per doc,
    * nothing all-pairs, nothing collected. */
  def decontaminate(train: DataFrame, bench: DataFrame, n: Int = 13): DataFrame = {
    val tg = gramHashes(train, "doc_id", "text", n)
    val bg = gramHashes(bench, "doc_id", "text", n)
      .select(col("doc_id").as("bench_id"), col("gh")).distinct()
    val sizes = tg.groupBy("doc_id").agg(countDistinct(col("gh")).as("n_grams"))
    tg.join(bg, "gh")
      .groupBy("doc_id")
      .agg(countDistinct(col("gh")).as("n_shared"),
        countDistinct(col("bench_id")).as("n_bench"))
      .join(sizes, "doc_id")
      .select(col("doc_id"), col("n_grams"), col("n_shared"), col("n_bench"),
        (col("n_shared").cast("double") / col("n_grams").cast("double"))
          .as("contamination"))
  }

  /** The distinct benchmark gram-digest set as a driver-side Set — the
    * broadcast input of [[graft.streaming.StreamingOps.decontaminateStream]].
    * Benchmark suites are eval sets (thousands of docs), so their gram
    * set is broadcast-sized by construction; the unbounded TRAIN side
    * never collects. */
  def benchmarkGramSet(bench: DataFrame, n: Int = 13): Set[String] = {
    val grams = gramHashes(bench, "doc_id", "text", n)
      .select("gh").distinct().collect()
    // eval suites are thousands of docs → at most low millions of
    // distinct gram digests; a corpus mistakenly passed as the bench
    // side must fail here, not OOM the driver or bloat every broadcast
    require(grams.length <= (1 << 22),
      s"benchmark gram set has ${grams.length} distinct grams (bound " +
        s"${1 << 22}) — this looks like a training corpus, not an eval set")
    grams.map(_.getString(0)).toSet
  }

  /** The (term → integer weight) model as a driver-side Map — the
    * broadcast input of [[graft.streaming.StreamingOps.scoreStream]].
    * A trained linear model is vocabulary-sized by construction; the
    * bound is asserted like [[benchmarkGramSet]]'s, and duplicate term
    * rows are rejected for the same double-count reason as
    * [[linearScore]]. */
  def weightsMap(weights: DataFrame): Map[String, Long] = {
    val rows = weights.select(col("term"), col("weight").cast("long")).collect()
    require(rows.length <= (1 << 22),
      s"model frame has ${rows.length} rows (bound ${1 << 22}) — a linear " +
        "model is vocabulary-sized; this looks like a corpus frame")
    val m = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    require(m.size == rows.length,
      s"model frame has duplicate term rows (${rows.length} rows, " +
        s"${m.size} distinct terms)")
    m
  }

  /** Deterministic per-stratum Bernoulli sampling toward `targets`
    * (stratum → share). `budget` is the total sample size target;
    * acceptance rate per stratum is `min(1, share·budget/n_stratum)` and
    * the accept test is the seeded uniform `u(doc_id) < rate`
    * (partition- and retry-invariant — never `rand()`). Returns the
    * sampled rows of `docs` (all columns) plus the per-row `rate`.
    * Strata absent from `targets` are dropped (share 0). */
  def mixtureSample(docs: DataFrame, stratumCol: String,
                    targets: Map[String, Double], budget: Long,
                    seed: String = "mix"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val shares = targets.toSeq.toDF(stratumCol, "share")
    val rates = docs.groupBy(stratumCol).agg(count(lit(1)).as("n_in"))
      .join(broadcast(shares), stratumCol)
      .select(col(stratumCol),
        least(lit(1.0), (col("share") * budget) / col("n_in")).as("rate"))
    val u: Column = Det.unit60(Det.seededKey(seed, col("doc_id")))
    docs.join(broadcast(rates), stratumCol)
      .where(u < col("rate"))
  }

  /** Leakage-safe split assignment (q80's pipeline twin): given a
    * materialized near-dup verdict frame `labels` (`doc_id`,
    * `cluster_id` — e.g. [[CorpusDedup]]'s cluster labels), assign every
    * CLUSTER to one of `splits` by the seeded cluster-keyed uniform, so
    * near-duplicates can never straddle a split boundary and leak
    * training text into evaluation. `splits` maps name → share (must sum
    * to ~1; boundaries are cumulative-share thresholds on the same
    * [[Det.unit60]] value the declared query uses). One projection over
    * `labels`, no shuffle — the cluster chain was paid when the verdict
    * materialized. */
  def leakageSafeSplit(labels: DataFrame,
                       splits: Seq[(String, Double)] = Seq(
                         "train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
                       seed: String = ":q80"): DataFrame = {
    val u: Column = Det.unit60(
      md5(concat(col("cluster_id").cast("string"), lit(seed))))
    val cum = splits.scanLeft(0.0) { case (acc, (_, s)) => acc + s }.tail
    val split = splits.init.zip(cum.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), hi), els) =>
      when(u < hi, name).otherwise(els)
    }
    labels.withColumn("split", split)
  }

  /** Linear classifier inference over bag-of-words features (q84's
    * production twin): per-doc logit = Σ weight(term) over all token
    * occurrences, scored through a sigmoid. `weights` is the trained
    * model as a (term, weight) frame — vocabulary-sized, so Catalyst
    * broadcasts the join; terms absent from the model contribute 0
    * (left join + coalesce), the standard out-of-vocabulary posture.
    * One explode into a doc-keyed hash-agg; integer weights keep the
    * logit partition-order-exact (the q84 determinism contract). */
  def linearScore(docs: DataFrame, weights: DataFrame,
                  scale: Double = 16.0): DataFrame = {
    // a model frame with duplicate term rows would silently multiply
    // join rows and double-count that term's weight in every logit;
    // the frame is vocabulary-sized (broadcast contract), so the check
    // is one tiny agg job
    val w = weights.agg(count(lit(1)), countDistinct(col("term"))).head()
    require(w.getLong(0) == w.getLong(1),
      s"model frame has duplicate term rows (${w.getLong(0)} rows, " +
        s"${w.getLong(1)} distinct terms) — each duplicate would " +
        "double-count its weight in the join")
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .join(broadcast(weights), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("weight"), lit(0L))).as("logit"))
      .select(col("doc_id"), col("logit"),
        (lit(1.0) / (lit(1.0) + exp(-(col("logit").cast("double") / scale))))
          .as("score"),
        (col("logit") < 0).as("flagged"))
  }
}
