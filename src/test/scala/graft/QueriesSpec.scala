package graft

import org.apache.spark.sql.functions._

/** Invariant checks for the declared queries on sf0.001 — fast smoke plus
  * the properties the DuckDB hash can't see (the parity gate itself runs via
  * tools/check_oracle.py against sf0.01).
  */
class QueriesSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("every declared query runs and is non-empty on sf0.001") {
    val counts = SparkEntry.queries.map { case (name, fn) => name -> fn(spark, sf0001).count() }
    val empty = counts.filter(_._2 == 0)
    assert(empty.isEmpty, s"empty results: ${empty.keys.mkString(", ")}")
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q05 weights: sum over group of 1/weight*total = group size") {
    val df = run("q05_invfreq_weights")
    val total = df.count().toDouble
    // weight = total/grp_n → grp_n = total/weight; per group all weights equal
    val distinctPerGroup = df.groupBy("c_mktsegment", "c_nationkey")
      .agg(countDistinct(col("weight")).as("w"))
      .filter(col("w") =!= 1).count()
    assert(distinctPerGroup == 0)
    // Σ 1/weight = Σ grp_n/total = 1.0 per distinct group... overall Σ over rows = Σ grp_n²/total
    val sumInv = df.select(sum(lit(1.0) / col("weight"))).head().getDouble(0)
    val check = df.groupBy("c_mktsegment", "c_nationkey").count()
      .select(sum(col("count") * col("count"))).head().getLong(0) / total
    assert(math.abs(sumInv - check) < 1e-6)
  }

  test("q07 split: partitions are disjoint and exhaustive over kept subjects") {
    val df = run("q07_split_pipeline")
    assert(df.groupBy("c_custkey").count().filter(col("count") > 1).count() == 0, "subject in 2 splits")
    val bySplit = df.groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("test", "train", "valid"))
    // valid ≈ 20% of dev
    val dev = bySplit("train") + bySplit("valid")
    assert(math.abs(bySplit("valid").toDouble - math.floor(dev * 0.2 + 0.5)) <= 0.0)
  }

  test("q09 grouped sample: at most 15 per nation, deterministic across runs") {
    val a = run("q09_grouped_sample")
    assert(a.groupBy("c_nationkey").count().filter(col("count") > 15).count() == 0)
    val h1 = a.orderBy("c_custkey").collect().toSeq
    val h2 = run("q09_grouped_sample").orderBy("c_custkey").collect().toSeq
    assert(h1 == h2, "seeded sample not deterministic")
  }

  test("q03 explode conserves counts: rows = Σ (linenumber − 1)") {
    val exploded = run("q03_explode_filter").count()
    val expected = Tables.lineitem(spark, sf0001)
      .filter(col("l_orderkey") % 20 === 0)
      .select(sum(col("l_linenumber") - 1)).head().getLong(0)
    assert(exploded == expected)
  }

  test("q14 histogram: counts sum to table size, cdf ends at 1") {
    val h = run("q14_histogram_cdf").collect()
    val total = Tables.lineitem(spark, sf0001).count()
    assert(h.map(_.getAs[Long]("cnt")).sum == total)
    val last = h.maxBy(_.getAs[Long]("bucket"))
    assert(math.abs(last.getAs[Double]("cdf") - 1.0) < 1e-12)
  }

  test("q15 circle encloses all its points") {
    val circles = run("q15_enclosing_circle").collect()
      .map(r => r.getAs[String]("flag") -> ((r.getAs[Double]("cx"), r.getAs[Double]("cy"), r.getAs[Double]("r")))).toMap
    val pts = Tables.lineitem(spark, sf0001).select(
      col("l_returnflag").as("flag"),
      (col("l_partkey") % 97).cast("double").as("x"),
      (col("l_suppkey") % 89).cast("double").as("y")).collect()
    pts.foreach { row =>
      val (cx, cy, r) = circles(row.getAs[String]("flag"))
      val d = math.hypot(row.getAs[Double]("x") - cx, row.getAs[Double]("y") - cy)
      assert(d <= r + 1e-6, s"point outside circle: $row d=$d r=$r")
    }
  }

  test("q25 top-k: ranks are 1..5 per probe and sims descend") {
    val rows = run("q25_cosine_topk").collect()
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rk"))
      assert(byRank.map(_.getAs[Int]("rk")).toSeq == (1 to 5))
      val sims = byRank.map(_.getAs[Double]("cosine")).toSeq
      assert(sims == sims.sorted.reverse, "similarities not descending")
      assert(sims.forall(s => s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9))
    }
  }

  test("q26 exact dedup: canonical ids unique, copies sum to corpus size") {
    val df = run("q26_exact_dedup")
    val n = Tables.documents(spark, sf0001).count()
    assert(df.select(sum("n_copies")).head().getLong(0) == n)
    assert(df.select(countDistinct("content_hash")).head().getLong(0) == df.count())
  }

  test("q28 simhash is within 16-bit range") {
    val bad = run("q28_simhash").filter(col("simhash16") < 0 || col("simhash16") > 65535).count()
    assert(bad == 0)
  }

  test("q54 pack windows: token conservation, every bin full except the last") {
    val df = run("q54_pack_windows").orderBy("bin").collect()
    val corpusTokens = Tables.documents(spark, sf0001)
      .select(sum(size(split(col("text"), " ")))).head().getLong(0)
    assert(df.map(_.getAs[Int]("n_tokens").toLong).sum == corpusTokens,
      "window token counts must sum to the corpus token count")
    assert(df.map(_.getAs[Int]("bin")).toSeq == df.indices.map(identity),
      "bins are contiguous from 0")
    df.dropRight(1).foreach(r =>
      assert(r.getAs[Int]("n_tokens") == 2048, "every bin but the last is full"))
    assert(df.last.getAs[Int]("n_tokens") <= 2048)
  }

  test("q55 product quantization: codes in range, exact nonnegative error, full coverage") {
    val df = run("q55_product_quantize")
    val nVecs = Tables.embeddings(spark, sf0001).count()
    assert(df.count() == nVecs, "one row per vector")
    val badCode = df.filter(
      (0 to 3).map(i => col(s"code$i") < 1 || col(s"code$i") > 16).reduce(_ || _)).count()
    assert(badCode == 0, "codes are 1..16 in each subspace")
    assert(df.filter(col("sq_err") < -1e-9).count() == 0, "squared error nonnegative")
  }

  test("q57 LSH near-dup pairs: ordered ids, per-bucket top-3, cosine in range") {
    val df = run("q57_embed_neardup_lsh")
    assert(df.filter(col("id_a") >= col("id_b")).count() == 0, "pairs ordered id_a < id_b")
    assert(df.filter(col("rk") < 1 || col("rk") > 3).count() == 0, "top-3 per bucket")
    assert(df.filter(abs(col("cosine")) > 1.0 + 1e-9).count() == 0, "cosine in [-1, 1]")
    assert(df.count() > 0)
  }

  test("q61 DSIR select: one row per doc under k, finite scores, keys distinct") {
    val df = run("q61_dsir_select")
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(df.count() == math.min(100L, nDocs), "top-k, or the whole corpus when smaller")
    assert(df.filter(col("mean_lr").isNull || isnan(col("mean_lr"))).count() == 0)
    val keys = df.select("gumbel_key").collect().map(_.getDouble(0))
    assert(keys.distinct.length == keys.length, "seeded Gumbel keys never collide")
    // determinism: a second run selects the identical set
    val again = run("q61_dsir_select").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(again == df.select("doc_id").collect().map(_.getLong(0)).toSeq)
  }

  test("q62 dedup profile: docs partition the corpus, singletons remove nothing") {
    val df = run("q62_dedup_profile").collect()
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(df.map(_.getAs[Long]("n_docs")).sum == nDocs, "every doc in exactly one size bucket")
    df.filter(_.getAs[Long]("cluster_size") == 1L).foreach { r =>
      assert(r.getAs[Long]("tokens_removed") == 0L, "keep-one removes nothing from singletons")
    }
    df.foreach { r =>
      val f = r.getAs[Double]("frac_corpus_removed")
      assert(f >= 0.0 && f <= 1.0)
      assert(r.getAs[Long]("tokens_removed") <= r.getAs[Long]("n_tokens"))
    }
  }

  test("q63 embed outliers: one row per vector, d2 nonnegative, ratio means 1 per label") {
    val df = run("q63_embed_outliers")
    val nVecs = Tables.embeddings(spark, sf0001).count()
    assert(df.count() == nVecs, "one row per vector")
    assert(df.filter(col("d2") < -1e-9).count() == 0, "squared distance nonnegative")
    // mean of d2/mean_d2 within each label is 1 by construction
    val m = df.groupBy("label").agg(avg(col("ratio")).as("r")).collect()
    m.foreach(r => assert(math.abs(r.getAs[Double]("r") - 1.0) < 1e-9,
      s"label ${r.get(0)} mean ratio ${r.getAs[Double]("r")}"))
    assert(df.filter(col("is_outlier") =!= (col("ratio") > 2.0)).count() == 0)
  }

  test("q56 ADC search: ranks 1..5 per probe, distances ascend, never self") {
    val df = run("q56_pq_adc_search").collect()
    val byProbe = df.groupBy(_.getAs[Long]("probe_id"))
    byProbe.foreach { case (pid, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).toSeq == (1 to rows.length),
        s"probe $pid ranks contiguous from 1")
      val dists = sorted.map(_.getAs[Double]("adc_dist"))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b },
        s"probe $pid distances ascend")
      assert(rows.forall(_.getAs[Long]("neighbor_id") != pid), "self excluded")
      assert(dists.forall(_ >= -1e-9), "ADC distance nonnegative")
    }
    assert(byProbe.size == 5 && byProbe.values.forall(_.length == 5))
  }

  test("q64 term novelty: one row per doc, doc 0 fully novel, counts conserve vocabulary") {
    val df = run("q64_term_novelty")
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(df.count() == nDocs, "one row per document")
    val first = df.orderBy("doc_id").limit(1).collect()(0)
    assert(first.getAs[Double]("novelty") == 1.0, "the first document mints its whole vocabulary")
    val rows = df.collect()
    rows.foreach { r =>
      val nd = r.getAs[Long]("n_distinct_terms"); val nn = r.getAs[Long]("n_new_terms")
      assert(nn >= 0 && nn <= nd)
      assert(math.abs(r.getAs[Double]("novelty") - nn.toDouble / nd) < 1e-12)
    }
    // every distinct term in the corpus is minted exactly once
    val vocab = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("t")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_new_terms")).sum == vocab,
      "sum of per-doc new terms = corpus vocabulary size")
  }

  test("q65 quality ntile: bin sizes differ by at most one and score-monotone") {
    val df = run("q65_quality_ntile")
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(df.count() == nDocs, "one row per document")
    val sizes = df.groupBy("qbin").count().collect()
      .map(r => r.getAs[Long]("qbin") -> r.getAs[Long]("count")).toMap
    assert(sizes.keySet == (1L to 10L).toSet, "exactly bins 1..10")
    assert(sizes.values.max - sizes.values.min <= 1, "NTILE balance: sizes differ by ≤ 1")
    // the first n mod k bins carry the extra row (SQL NTILE remainder rule)
    val rem = (nDocs % 10).toInt
    if (rem != 0) {
      (1 to rem).foreach(b => assert(sizes(b.toLong) == nDocs / 10 + 1, s"bin $b holds the extra row"))
      ((rem + 1) to 10).foreach(b => assert(sizes(b.toLong) == nDocs / 10, s"bin $b holds the base size"))
    }
    // monotone: max score of bin b ≤ min score of bin b+1
    val bounds = df.groupBy("qbin")
      .agg(min(col("quality_score")).as("lo"), max(col("quality_score")).as("hi"))
      .collect().map(r => (r.getAs[Long]("qbin"), r.getAs[Double]("lo"), r.getAs[Double]("hi")))
      .sortBy(_._1)
    bounds.zip(bounds.tail).foreach { case ((b, _, hi), (_, lo2, _)) =>
      assert(hi <= lo2, s"bin $b upper bound exceeds next bin's lower bound")
    }
  }

  test("q66 dup spans: one row per doc, bounds hold, exact docs fully covered") {
    val df = run("q66_dup_spans")
    val docsDf = Tables.documents(spark, sf0001)
    assert(df.count() == docsDf.count(), "one row per document")
    df.collect().foreach { r =>
      val n = r.getAs[Long]("n_tokens"); val ns = r.getAs[Long]("n_spans")
      val nd = r.getAs[Long]("n_dup_spans"); val dt = r.getAs[Long]("dup_tokens")
      assert(ns == (if (n >= 8) n - 7 else 0L))
      assert(nd >= 0 && nd <= ns, "duplicated spans bounded by span count")
      assert(dt >= 0 && dt <= n, "covered tokens bounded by doc length")
      // every duplicated span covers 8 tokens; union of nd spans covers
      // at least 8 (one span) and at most min(n, 8*nd) positions
      if (nd > 0) assert(dt >= 8 && dt <= math.min(n, 8 * nd))
      else assert(dt == 0, "no duplicated span → no covered token")
      assert(math.abs(r.getAs[Double]("dup_frac") - dt.toDouble / n) < 1e-12)
    }
    // a doc whose full text appears in ≥2 docs (exact dup, q26's axis) must
    // be 100% covered: every span of both copies is cross-document
    val dupDocs = docsDf.groupBy("text")
      .agg(countDistinct(col("doc_id")).as("nd"), collect_list(col("doc_id")).as("ids"))
      .filter(col("nd") >= 2 && size(split(col("text"), " ")) >= 8)
      .select(explode(col("ids")).as("doc_id")).collect().map(_.getLong(0)).toSet
    if (dupDocs.nonEmpty) {
      val fullCover = df.filter(col("doc_id").isin(dupDocs.toSeq: _*))
        .collect()
      fullCover.foreach { r =>
        assert(r.getAs[Long]("dup_tokens") == r.getAs[Long]("n_tokens"),
          s"exact-duplicate doc ${r.getAs[Long]("doc_id")} must be fully span-covered")
      }
    }
  }

  test("q67 source mix: weights normalize, temperature flattens the share curve") {
    val df = run("q67_source_mix")
    val rows = df.collect()
    val praw = rows.map(_.getAs[Double]("p_raw"))
    val w = rows.map(_.getAs[Double]("mix_weight"))
    assert(math.abs(praw.sum - 1.0) < 1e-9, "raw shares sum to 1")
    assert(math.abs(w.sum - 1.0) < 1e-9, "mix weights sum to 1")
    val totTokens = rows.map(_.getAs[Long]("src_tokens")).sum.toDouble
    assert(math.abs(rows.map(_.getAs[Double]("expected_tokens")).sum - totTokens) < 1e-6 * totTokens,
      "expected token budgets sum to the corpus size")
    // α < 1 compresses: sources above the mean share lose, below gain,
    // and the ordering of weights still follows the ordering of shares
    rows.foreach { r =>
      val p = r.getAs[Double]("p_raw"); val mw = r.getAs[Double]("mix_weight")
      assert(mw > 0)
      if (p > 0) {
        val ratio = mw / p
        // w/p = p^(α-1)/Σ — strictly decreasing in p, so the largest
        // source has the smallest ratio
        assert(!ratio.isNaN && !ratio.isInfinite)
      }
    }
    val byShare = rows.sortBy(_.getAs[Double]("p_raw"))
    byShare.zip(byShare.tail).foreach { case (a, b) =>
      assert(a.getAs[Double]("mix_weight") <= b.getAs[Double]("mix_weight") + 1e-12,
        "weight order follows share order (monotone transform)")
      // flattening: the boost ratio w/p is monotone non-increasing in p
      if (a.getAs[Double]("p_raw") > 0 && b.getAs[Double]("p_raw") > 0) {
        val ra = a.getAs[Double]("mix_weight") / a.getAs[Double]("p_raw")
        val rb = b.getAs[Double]("mix_weight") / b.getAs[Double]("p_raw")
        assert(ra >= rb - 1e-12, "temperature flattens: smaller sources get the larger boost")
      }
    }
  }
}
