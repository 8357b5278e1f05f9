package graft.queries

import graft.{DeclaredQuery, Tables}
import graft.util.Det
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus-curation operators a production training-data pipeline runs
  * between dedup and packing: benchmark decontamination and mixture
  * (quota) sampling. Both are new surface beyond the reference (which has
  * no text pipeline) — declared here with full DuckDB oracles like every
  * other query.
  */
object CurationQueries {

  // ---------------------------------------------------------------- Q77
  /** X41: benchmark decontamination — flag training documents that share
    * at least one word-13-gram with any held-out benchmark document
    * (the GPT-3/PaLM-style n-gram contamination rule; 13 is the published
    * window). Benchmark set = `doc_id % 37 == 0` (a deterministic ~2.7%
    * holdout); result lists every contaminated TRAIN document with its
    * shared-gram and benchmark-doc counts.
    *
    * Scale shape: grams are built per-row with a bound HOF (the q27
    * shingle pattern), hashed to md5 immediately — the shuffle and the
    * join key carry 32-char digests, never 13-word strings. The join is a
    * plain hash join on the gram digest: the benchmark side is DISTINCT
    * (bench_id, gram) — ~3% of the corpus — and matches are rare, so the
    * probe output stays tiny. Per-doc gram counts are map-side-combinable
    * distinct aggs. Nothing is all-pairs; nothing collects.
    */
  private def words: Column = split(col("text"), " ")

  /** Bind the split array once (q27's trick — otherwise Catalyst inlines
    * `split(text)` at each of the 13 element_at references). */
  private def bound(arr: Column)(f: Column => Column): Column =
    element_at(transform(array(arr), f), 1)

  private def grams13: Column = bound(words) { w =>
    when(size(w) >= 13, transform(sequence(lit(1), size(w) - 12),
      i => concat_ws(" ", (0 until 13).map(o => element_at(w, i + o)): _*)))
      .otherwise(array())
  }

  private val gram13Sql: String =
    (0 until 13).map(o => if (o == 0) "w[i]" else s"w[i+$o]").mkString(" || ' ' || ")

  val q77 = DeclaredQuery(
    "q77_decontaminate",
    Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            |g0 AS (SELECT doc_id,
            |              list_transform(range(1, len(w) - 11), i -> $gram13Sql) AS gs
            |       FROM w WHERE len(w) >= 13),
            |g AS (SELECT doc_id, md5(unnest(gs)) AS gh FROM g0),
            |b AS (SELECT DISTINCT doc_id AS bench_id, gh FROM g WHERE doc_id % 37 = 0),
            |tr AS (SELECT doc_id, gh FROM g WHERE doc_id % 37 <> 0),
            |sz AS (SELECT doc_id, COUNT(DISTINCT gh) AS n_grams FROM tr GROUP BY 1),
            |hit AS (SELECT tr.doc_id, tr.gh, b.bench_id FROM tr JOIN b ON tr.gh = b.gh),
            |a AS (SELECT doc_id, COUNT(DISTINCT gh) AS n_shared,
            |             COUNT(DISTINCT bench_id) AS n_bench
            |      FROM hit GROUP BY 1)
            |SELECT a.doc_id, sz.n_grams, a.n_shared, a.n_bench,
            |       CAST(a.n_shared AS DOUBLE) / CAST(sz.n_grams AS DOUBLE) AS contamination
            |FROM a JOIN sz ON a.doc_id = sz.doc_id
            |ORDER BY a.doc_id""".stripMargin)) { (s, d) =>
    val g = Tables.documents(s, d)
      .select(col("doc_id"), explode(grams13).as("g"))
      .select(col("doc_id"), md5(col("g")).as("gh"))
    val bench = g.where(col("doc_id") % 37 === 0)
      .select(col("doc_id").as("bench_id"), col("gh")).distinct()
    val train = g.where(col("doc_id") % 37 =!= 0)
    val sizes = train.groupBy("doc_id")
      .agg(countDistinct(col("gh")).as("n_grams"))
    val agg = train.join(bench, "gh")
      .groupBy("doc_id")
      .agg(countDistinct(col("gh")).as("n_shared"),
        countDistinct(col("bench_id")).as("n_bench"))
    agg.join(sizes, "doc_id")
      .select(col("doc_id"), col("n_grams"), col("n_shared"), col("n_bench"),
        (col("n_shared").cast("double") / col("n_grams").cast("double"))
          .as("contamination"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- Q78
  /** X42: mixture (quota) sampling — deterministic per-stratum Bernoulli
    * sampling that re-shapes the corpus toward a target language mix
    * (uniform 20% per language here; `en` is ~39% of the corpus, so it is
    * down-sampled while the minority languages keep everything). The
    * sample budget is three quarters of the corpus; per-language
    * acceptance rate is
    * `min(1, target_share · M / n_lang)` and acceptance is the seeded
    * uniform `u(doc_id) < rate` — [[Det.unit60]] over a shared md5, so
    * partition- and engine-invariant (never `rand()`; SURVEY §7.4.2).
    *
    * Scale shape: one corpus scan for the per-language counts (5 rows,
    * broadcast back), one scan for the accept/count — no window over the
    * corpus, no collect; the per-lang report frame is bounded by the
    * language cardinality.
    */
  private val q78Share = 0.2

  val q78 = DeclaredQuery(
    "q78_mixture_sample",
    // 0.2e0 / 1e0: scientific notation forces DOUBLE literals in DuckDB
    // (plain 0.2 is DECIMAL there but Double in Spark — a parity trap)
    Some(s"""WITH t AS (SELECT COUNT(*) * 3 // 4 AS m FROM documents),
            |l AS (SELECT lang, COUNT(*) AS n_in FROM documents GROUP BY lang),
            |r AS (SELECT lang, n_in,
            |             LEAST(1e0, (${q78Share}e0 * t.m) / n_in) AS rate
            |      FROM l CROSS JOIN t),
            |u AS (SELECT lang, ${Det.sql.seededKey("q78", "doc_id")} AS h
            |      FROM documents),
            |s AS (SELECT u.lang, COUNT(*) AS n_sampled
            |      FROM u JOIN r ON u.lang = r.lang
            |      WHERE ${Det.sql.unit60("h")} < r.rate
            |      GROUP BY u.lang),
            |tot AS (SELECT SUM(n_sampled) AS ts FROM s)
            |SELECT r.lang, r.n_in, r.rate, s.n_sampled,
            |       CAST(s.n_sampled AS DOUBLE) / CAST(tot.ts AS DOUBLE) AS achieved_share
            |FROM r JOIN s ON r.lang = s.lang CROSS JOIN tot
            |ORDER BY r.lang NULLS FIRST""".stripMargin)) { (s, d) =>
    val docs = Tables.documents(s, d)
    val m = docs.agg(count(lit(1)).as("n_total"))
      .select(expr("n_total * 3 DIV 4").as("m"))
    val rates = docs.groupBy("lang").agg(count(lit(1)).as("n_in"))
      .crossJoin(broadcast(m))
      .select(col("lang"), col("n_in"),
        least(lit(1.0), (lit(q78Share) * col("m")) / col("n_in")).as("rate"))
    val u = Det.unit60(Det.seededKey("q78", col("doc_id")))
    val sampled = docs.select(col("lang"), u.as("u"))
      .join(broadcast(rates.select("lang", "rate")), "lang")
      .where(col("u") < col("rate"))
      .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
    val tot = sampled.agg(sum(col("n_sampled")).as("ts"))
    rates.join(sampled, "lang")
      .crossJoin(broadcast(tot))
      .select(col("lang"), col("n_in"), col("rate"), col("n_sampled"),
        (col("n_sampled").cast("double") / col("ts").cast("double"))
          .as("achieved_share"))
      .orderBy("lang")
  }

  // ---------------------------------------------------------------- Q83
  /** X47: filter-funnel attrition report — the per-rule survivor table a
    * curation run publishes (the Dolma/RefinedWeb-style "what did each
    * filter cost" audit): four quality rules applied as a CUMULATIVE
    * conjunction (length floor → language → chars-per-token band →
    * distinct-token repetition floor), one row per stage with docs in/out
    * and the drop fraction. The rules reuse the corpus's declared feature
    * set (q29–q31's shapes); the report is the funnel, not the filter —
    * a selection would `where` the final conjunction.
    *
    * Scale shape: ONE scan — per-doc booleans feed a single 1-row
    * conditional agg; the 4-stage report is exploded from that row
    * (never four passes, never a collect). */
  val q83 = DeclaredQuery(
    "q83_filter_funnel",
    Some("""WITH f AS (SELECT
           |    len(string_split(text, ' ')) >= 20 AS b1,
           |    lang = 'en' AS b2,
           |    (CAST(n_chars AS DOUBLE) / len(string_split(text, ' '))) BETWEEN 3 AND 8 AS b3,
           |    (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           |       / len(string_split(text, ' '))) >= 0.25 AS b4
           |  FROM documents),
           |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS s0,
           |    CAST(SUM(CASE WHEN b1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
           |    CAST(SUM(CASE WHEN b1 AND b2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
           |    CAST(SUM(CASE WHEN b1 AND b2 AND b3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
           |    CAST(SUM(CASE WHEN b1 AND b2 AND b3 AND b4 THEN 1 ELSE 0 END) AS BIGINT) AS s4
           |  FROM f)
           |SELECT stage, rule, docs_in, docs_out, docs_in - docs_out AS dropped,
           |       CAST(docs_in - docs_out AS DOUBLE) / CAST(docs_in AS DOUBLE) AS drop_frac
           |FROM (
           |  SELECT 1 AS stage, 'min_length' AS rule, s0 AS docs_in, s1 AS docs_out FROM a
           |  UNION ALL SELECT 2, 'lang_en', s1, s2 FROM a
           |  UNION ALL SELECT 3, 'chars_per_token', s2, s3 FROM a
           |  UNION ALL SELECT 4, 'repetition', s3, s4 FROM a)
           |ORDER BY stage""".stripMargin)) { (s, d) =>
    val w = words
    val nTok = size(w)
    val b1 = nTok >= 20
    val b2 = col("lang") === "en"
    val b3 = (col("n_chars").cast("double") / nTok)
      .between(3, 8)
    val b4 = (size(array_distinct(w)).cast("double") / nTok) >= 0.25
    def srv(c: Column) = sum(when(c, 1L).otherwise(0L))
    val a = Tables.documents(s, d)
      .agg(count(lit(1)).as("s0"), srv(b1).as("s1"), srv(b1 && b2).as("s2"),
        srv(b1 && b2 && b3).as("s3"), srv(b1 && b2 && b3 && b4).as("s4"))
    a.select(explode(array(
        struct(lit(1).as("stage"), lit("min_length").as("rule"),
          col("s0").as("docs_in"), col("s1").as("docs_out")),
        struct(lit(2).as("stage"), lit("lang_en").as("rule"),
          col("s1").as("docs_in"), col("s2").as("docs_out")),
        struct(lit(3).as("stage"), lit("chars_per_token").as("rule"),
          col("s2").as("docs_in"), col("s3").as("docs_out")),
        struct(lit(4).as("stage"), lit("repetition").as("rule"),
          col("s3").as("docs_in"), col("s4").as("docs_out")))).as("x"))
      .select(col("x.stage"), col("x.rule"), col("x.docs_in"), col("x.docs_out"))
      .withColumn("dropped", col("docs_in") - col("docs_out"))
      .withColumn("drop_frac",
        col("dropped").cast("double") / col("docs_in").cast("double"))
      .orderBy("stage")
  }

  // ---------------------------------------------------------------- Q84
  /** X48: linear quality-classifier inference — the GPT-3-style logistic
    * filter (hashed bag-of-words features · weight vector → logit →
    * sigmoid) run as a query. The declared weights are hash-derived
    * integers in [−8, 8] (`hex60(md5(term||'#w84')) % 17 − 8`) so the
    * oracle replays them without a model fixture; a REAL trained model
    * plugs in as a broadcast (term, weight) frame via
    * [[graft.pipeline.Curation.linearScore]] — same plan, weights joined
    * instead of hashed (parity pinned by CurationPipelineSpec).
    *
    * Determinism: the logit is an INTEGER sum (integer weights × integer
    * occurrence counts), so partition order cannot perturb it; the
    * sigmoid is one exp per doc on an integer-derived argument, and no
    * ordering depends on the double. Scale shape: one explode into a
    * doc-keyed hash-agg (map-side combinable), no joins, no windows. */
  val q84 = {
    val wSql = s"(${Det.sql.hex60("md5(term || '#w84')")} % 17 - 8)"
    DeclaredQuery(
      "q84_classifier_score",
      Some(s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
              |l AS (SELECT doc_id, CAST(SUM($wSql) AS BIGINT) AS logit
              |      FROM t GROUP BY doc_id)
              |SELECT doc_id, logit,
              |       1.0 / (1.0 + exp(-(CAST(logit AS DOUBLE) / 16.0))) AS score,
              |       logit < 0 AS flagged
              |FROM l ORDER BY doc_id""".stripMargin)) { (s, d) =>
      val weight = pmod(Det.hex60(md5(concat(col("term"), lit("#w84")))), lit(17L)) - 8L
      Tables.documents(s, d)
        .select(col("doc_id"), explode(words).as("term"))
        .groupBy("doc_id").agg(sum(weight).as("logit"))
        .select(col("doc_id"), col("logit"),
          (lit(1.0) / (lit(1.0) + exp(-(col("logit").cast("double") / 16.0))))
            .as("score"),
          (col("logit") < 0).as("flagged"))
        .orderBy("doc_id")
    }
  }

  // ---------------------------------------------------------------- Q131
  /** X95: source-diversity report — per language, the Simpson dominance
    * index Σp² and its inverse (effective source count), the curation
    * diagnostic for "is this slice really diverse or one crawl wearing
    * twenty hats". Simpson instead of Shannon BY DESIGN: Σp² =
    * Σcnt²/total² is a ratio of exact integers — no logarithms, so the
    * ppm report is pure integer arithmetic and the effective count is
    * ONE IEEE division of exact integers (the engine's determinism
    * discipline; entropy's Σ p·ln p would need a fixed-order float sum).
    * 1e6·Σcnt² outgrows int64 near sf10, widened DECIMAL(38)/HUGEINT
    * (the q109/q115/q117 pattern).
    *
    * Plan: two map-side-combinable hash-aggs — (lang, source) counts,
    * then per-lang moments. Nothing else.
    */
  val q131 = DeclaredQuery(
    "q131_source_diversity",
    Some("""WITH c AS (SELECT lang, source, COUNT(*) AS cnt
           |           FROM documents GROUP BY 1, 2),
           |a AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS total,
           |             COUNT(*) AS n_sources,
           |             CAST(SUM(cnt * cnt) AS BIGINT) AS sq
           |      FROM c GROUP BY 1)
           |SELECT lang, total AS n_docs, n_sources,
           |       CAST((CAST(1000000 AS HUGEINT) * sq)
           |            // (CAST(total AS HUGEINT) * total) AS BIGINT)
           |         AS dominance_ppm,
           |       CAST(total AS DOUBLE) * total / sq AS effective_sources
           |FROM a ORDER BY 1 NULLS FIRST""".stripMargin)) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("lang"))
      .agg(sum(col("cnt")).as("total"),
        count(lit(1)).as("n_sources"),
        sum(col("cnt") * col("cnt")).as("sq"))
      .select(col("lang"), col("total").as("n_docs"), col("n_sources"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * sq)
               | div (CAST(total AS DECIMAL(38,0)) * total) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("dominance_ppm"),
        (col("total").cast("double") * col("total") / col("sq"))
          .as("effective_sources"))
      .orderBy("lang")
  }

  val all: Seq[DeclaredQuery] = Seq(q77, q78, q83, q84, q131)
}
