package graft.queries

import graft.{DeclaredQuery, Tables}
import graft.operators.Ranks
import graft.util.Det
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Q01–Q23 from SURVEY.md §2.14 — the reference's relational computation
  * shapes re-expressed on the TPC-H-ish testdata star schema.
  *
  * Every query is a plain Catalyst plan (no UDFs) so predicate pushdown,
  * column pruning and whole-stage codegen apply end-to-end; joins against
  * dimension-sized sides are explicitly `broadcast(...)`. All money math is
  * exact integer cents (Det.cents) so results are bit-stable under any
  * partitioning/order — see Det's scaladoc.
  */
object RelationalQueries {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)

  // ---------------------------------------------------------------- Q01
  /** P1/P2/P3/P8/F11: select + rename + drop + cast projection of customer.
    * Reference shape: `/root/reference/src/qcardia_data/setup/reformat/
    * utils.py:116-129` (column select/reorder) + `mm2.py:75-83` (rename) +
    * `dataset_cacher.py:381-388` (casts). */
  val q01 = DeclaredQuery(
    "q01_projection",
    Some("""SELECT c_name AS subject_id, c_mktsegment AS segment,
           |       CAST(c_custkey AS INTEGER) AS custkey_i32,
           |       CAST(ROUND(c_acctbal) AS BIGINT) AS acctbal_round
           |FROM customer ORDER BY custkey_i32""".stripMargin)) { (s, d) =>
    Tables.customer(s, d).select(
      col("c_name").as("subject_id"),
      col("c_mktsegment").as("segment"),
      col("c_custkey").cast("int").as("custkey_i32"),
      round(col("c_acctbal"), 0).cast("long").as("acctbal_round"))
      .orderBy("custkey_i32")
  }

  // ---------------------------------------------------------------- Q02
  /** P4/P5: equality + IN-list predicates (`data_split.py:99-102`,
    * `dataset_cacher.py:171-174`). Filters reach the parquet scan as
    * PushedFilters. */
  val q02 = DeclaredQuery(
    "q02_filter",
    Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity
           |FROM lineitem
           |WHERE l_returnflag = 'R' AND l_linestatus IN ('F','O') AND l_quantity >= 30
           |ORDER BY l_orderkey, l_linenumber, l_quantity, l_linestatus""".stripMargin)) { (s, d) =>
    li(s, d)
      .filter(col("l_returnflag") === "R" &&
        col("l_linestatus").isin("F", "O") && col("l_quantity") >= 30)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity")
      // (orderkey, linenumber) is not unique in the testdata → the ORDER BY
      // totally orders the projected row so both engines agree.
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_linestatus")
  }

  // ---------------------------------------------------------------- Q03
  /** P6 + T2-shape: 1→N explode (posexplode of a sequence — the
    * DimensionsTo2Dd generator archetype, `transforms/dimensions.py:8-109`)
    * with the ed_only-style frame filter pushed below
    * (`dataset_cacher.py:346-353`). */
  val q03 = DeclaredQuery(
    "q03_explode_filter",
    Some("""SELECT l_orderkey, l_linenumber, frame_nr FROM (
           |  SELECT l_orderkey, l_linenumber,
           |         unnest(range(0, CAST(l_linenumber AS BIGINT))) AS frame_nr
           |  FROM lineitem WHERE l_orderkey % 20 = 0)
           |WHERE frame_nr <> 0
           |ORDER BY l_orderkey, l_linenumber, frame_nr""".stripMargin)) { (s, d) =>
    li(s, d).filter(col("l_orderkey") % 20 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        explode(sequence(lit(0L), col("l_linenumber").cast("long") - 1)).as("frame_nr"))
      .filter(col("frame_nr") =!= 0)
      .orderBy("l_orderkey", "l_linenumber", "frame_nr")
  }

  // ---------------------------------------------------------------- Q04
  /** P7/F1/F2/F3: regexp recode chain (`mm2.py:87-98`), zero-pad ids
    * (`mm2.py:84-86`), concat/split id packing (`utils.py:65-102`). */
  val q04 = DeclaredQuery(
    "q04_recode",
    Some("""SELECT p_partkey,
           |       regexp_replace(regexp_replace(p_type, 'ECONOMY', 'ECO', 'g'), 'SMALL', 'SM', 'g') AS type_code,
           |       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS pk_pad,
           |       concat_ws('-', p_brand, CAST(p_size AS VARCHAR)) AS brand_size,
           |       string_split(p_brand, '#')[2] AS brand_nr
           |FROM part ORDER BY p_partkey""".stripMargin)) { (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"),
      regexp_replace(regexp_replace(col("p_type"), "ECONOMY", "ECO"), "SMALL", "SM").as("type_code"),
      lpad(col("p_partkey").cast("string"), 8, "0").as("pk_pad"),
      concat_ws("-", col("p_brand"), col("p_size").cast("string")).as("brand_size"),
      element_at(split(col("p_brand"), "#"), 2).as("brand_nr"))
      .orderBy("p_partkey")
  }

  // ---------------------------------------------------------------- Q05
  /** A1/A2/J1: inverse-frequency sampler weights, null-tolerant composite
    * group key, merged back with a broadcast left join
    * (`pipeline/utils.py:120-135`). weight = total/group_size — a single
    * IEEE division of two exact integers. */
  val q05 = DeclaredQuery(
    "q05_invfreq_weights",
    Some("""SELECT c_custkey, c_mktsegment, c_nationkey,
           |       CAST((SELECT COUNT(*) FROM customer) AS DOUBLE)
           |         / CAST(COUNT(*) OVER (PARTITION BY c_mktsegment, c_nationkey) AS DOUBLE) AS weight
           |FROM customer ORDER BY c_custkey""".stripMargin)) { (s, d) =>
    val c = Tables.customer(s, d)
    // null-safe (<=>) merge-back, mirroring BatchServer
    // .inverseFrequencyWeights: the declared contract is null-as-group
    // (reference utils.py:121-135), and the oracle's window PARTITION BY
    // already counts NULL keys as a group — a using-columns join would
    // leave NULL-keyed customers with weight NULL
    val grp = c.groupBy("c_mktsegment", "c_nationkey").agg(count(lit(1)).as("grp_n"))
      .withColumnRenamed("c_mktsegment", "_g_seg")
      .withColumnRenamed("c_nationkey", "_g_nat")
    val tot = c.agg(count(lit(1)).as("total"))
    c.join(broadcast(grp),
        col("c_mktsegment") <=> col("_g_seg") && col("c_nationkey") <=> col("_g_nat"),
        "left")
      .crossJoin(broadcast(tot))
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
        (col("total").cast("double") / col("grp_n").cast("double")).as("weight"))
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- Q141
  /** R2, the DRAW itself (`pipeline/data_module.py:146-157`
    * WeightedRandomSampler): 1000 seeded with-replacement picks ∝ q05's
    * inverse-frequency weights, via [[graft.pipeline.BatchServer
    * .weightedDraw]]'s exact arithmetic — md5-hex60 uniforms over
    * cumulative integer micro-unit weight intervals, so DuckDB replays
    * every draw byte-for-byte (VERDICT r12 item 3: the last SURVEY §2
    * row that was property-tested but not oracle-hashed; q52/q61 proved
    * the seeded-md5 pattern). Scale: the cumulative table is the
    * two-phase bucketed prefix sum (no global window), draws route to
    * their bucket through a ≤1024-row broadcast boundary table, and the
    * final containment join is bucket-local. */
  val q141 = DeclaredQuery(
    "q141_weighted_draw",
    Some {
      val ordH = Det.sql.hex60("h")
      s"""WITH w AS (
         |  SELECT c_custkey,
         |         CAST((SELECT COUNT(*) FROM customer) AS DOUBLE)
         |           / CAST(COUNT(*) OVER (PARTITION BY c_mktsegment, c_nationkey) AS DOUBLE) AS weight,
         |         md5(CAST(c_custkey AS VARCHAR)) AS h
         |  FROM customer),
         |u AS (SELECT c_custkey, CAST(ROUND(weight*1e6) AS BIGINT) AS wu,
         |             $ordH AS ord
         |      FROM w),
         |c AS (SELECT c_custkey, wu,
         |             CAST(SUM(wu) OVER (ORDER BY ord, c_custkey) AS BIGINT) AS cum_hi
         |      FROM u),
         |t AS (SELECT MAX(cum_hi) AS tw FROM c),
         |dh AS (SELECT r.range AS draw_nr,
         |              md5(concat_ws(':', CAST(r.range AS VARCHAR), 'draw:7')) AS h
         |       FROM range(0, 1000) r),
         |d AS (SELECT draw_nr, $ordH % t.tw AS u FROM dh, t)
         |SELECT d.draw_nr, c.c_custkey AS picked
         |FROM d JOIN c ON d.u >= c.cum_hi - c.wu AND d.u < c.cum_hi
         |ORDER BY draw_nr""".stripMargin
    }) { (s, d) =>
    val c = Tables.customer(s, d)
      .select("c_custkey", "c_mktsegment", "c_nationkey")
    val weighted = graft.pipeline.BatchServer
      .inverseFrequencyWeights(c, Seq("c_mktsegment", "c_nationkey"))
    graft.pipeline.BatchServer.weightedDraw(weighted, "c_custkey",
        draws = 1000, seed = 7L)
      .select(col("draw_nr"), col("c_custkey").as("picked"))
      .orderBy("draw_nr")
  }

  // ---------------------------------------------------------------- Q06
  /** J2/A13: per-order enrichment join against the subject table + per-split
    * summary counts (`dataset_cacher.py:393-415`, `pipeline/utils.py:138-149`).
    * customer is dimension-sized → broadcast; orders shuffles once for the
    * groupBy only. */
  val q06 = DeclaredQuery(
    "q06_enrich_join",
    Some(s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
            |       COUNT(DISTINCT o_custkey) AS n_customers,
            |       ${Det.sql.sumMoney("o_totalprice")} AS total_price
            |FROM orders JOIN customer ON o_custkey = c_custkey
            |GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST""".stripMargin)) { (s, d) =>
    // customer is NOT broadcast: at 100 TB it is fact-sized (1.5M × SF rows);
    // a shuffle hash join on the key is the scale-correct plan, and AQE
    // promotes it to broadcast automatically when the build side is small.
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        Det.unCents(sum(Det.cents(col("o_totalprice")))).as("total_price"))
      .orderBy("c_mktsegment")
  }

  // ---------------------------------------------------------------- Q07
  /** J3/J4/J5/U1/U2/R1: the full data_split.py pipeline shape
    * (`pipeline/data_split.py:13-86`): seeded grouped test sample,
    * predicate-set overlap removal, anti-join dev set, seeded train/valid
    * partition with round(n*p) sizing. */
  val q07 = DeclaredQuery(
    "q07_split_pipeline",
    Some(s"""WITH ranked AS (
            |  SELECT c_custkey, c_acctbal, c_mktsegment,
            |         row_number() OVER (PARTITION BY c_mktsegment
            |           ORDER BY ${Det.sql.seededKey("1234", "c_custkey")}, c_custkey) AS rk_test
            |  FROM customer),
            |kept AS (
            |  SELECT * FROM ranked
            |  WHERE NOT (c_acctbal < 0 AND c_mktsegment IN ('BUILDING','MACHINERY'))),
            |dev AS (
            |  SELECT c_custkey,
            |         row_number() OVER (ORDER BY ${Det.sql.seededKey("5678", "c_custkey")}, c_custkey) AS rn,
            |         COUNT(*) OVER () AS n_dev
            |  FROM kept WHERE rk_test > 15)
            |SELECT c_custkey, split FROM (
            |  SELECT c_custkey, 'test' AS split FROM kept WHERE rk_test <= 15
            |  UNION ALL
            |  SELECT c_custkey,
            |         CASE WHEN rn <= FLOOR(CAST(n_dev AS DOUBLE)*0.2 + 0.5)
            |              THEN 'valid' ELSE 'train' END AS split
            |  FROM dev)
            |ORDER BY c_custkey""".stripMargin)) { (s, d) =>
    val c = Tables.customer(s, d)
    val wTest = Window.partitionBy(col("c_mktsegment"))
      .orderBy(Det.seededKey("1234", col("c_custkey")), col("c_custkey"))
    val ranked = c.withColumn("rk_test", row_number().over(wTest))
    val overlap = col("c_acctbal") < 0 && col("c_mktsegment").isin("BUILDING", "MACHINERY")
    val kept = ranked.filter(!overlap)
    val test = kept.filter(col("rk_test") <= 15)
      .select(col("c_custkey"), lit("test").as("split"))
    val dev = kept.filter(col("rk_test") > 15)
    // global seeded rank, two-phase (Ranks): a bare Window.orderBy would
    // serialize the whole dev set through one reducer at scale
    val devKey = Det.seededKey("5678", col("c_custkey"))
    val nDev = dev.agg(count(lit(1)).as("n_dev"))
    val trainValid = Ranks.globalRowNumber(dev, Ranks.hexBucket(devKey),
        Seq(devKey, col("c_custkey")), "rn")
      .crossJoin(broadcast(nDev))
      .select(col("c_custkey"),
        when(col("rn") <= floor(col("n_dev").cast("double") * 0.2 + 0.5), "valid")
          .otherwise("train").as("split"))
    test.unionByName(trainValid).orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- Q08
  /** J6: content-equality ("as-of by value") match — locate a row inside a
    * group by exact content hash, take min index
    * (`setup/reformat/utils.py:76-89`). Content keys are md5 over exact
    * integer cents so both engines hash identical strings. */
  val q08 = DeclaredQuery(
    "q08_content_match",
    Some(s"""WITH li AS (
            |  SELECT l_orderkey, l_linenumber,
            |         md5(concat_ws(',',
            |           CAST(${Det.sql.cents("l_quantity")} AS VARCHAR),
            |           CAST(${Det.sql.cents("l_discount")} AS VARCHAR))) AS content
            |  FROM lineitem WHERE l_orderkey % 50 = 0),
            |tgt AS (SELECT l_orderkey, content AS target FROM (
            |          SELECT l_orderkey, content,
            |                 row_number() OVER (PARTITION BY l_orderkey
            |                   ORDER BY l_linenumber DESC, content DESC) AS rk
            |          FROM li) WHERE rk = 1)
            |SELECT li.l_orderkey,
            |       MIN(CASE WHEN content = target THEN l_linenumber END) AS matched_linenumber
            |FROM li JOIN tgt ON li.l_orderkey = tgt.l_orderkey
            |GROUP BY li.l_orderkey ORDER BY li.l_orderkey""".stripMargin)) { (s, d) =>
    val rows = li(s, d).filter(col("l_orderkey") % 50 === 0)
      .withColumn("content", md5(concat_ws(",",
        Det.cents(col("l_quantity")).cast("string"),
        Det.cents(col("l_discount")).cast("string"))))
    // (l_orderkey, l_linenumber) is NOT unique in the testdata — a bare
    // max_by would tie-break nondeterministically; take the first row of an
    // explicit total order. Window + groupBy share the l_orderkey
    // partitioning, so this is one exchange and no join.
    val wTgt = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber").desc, col("content").desc)
    rows.withColumn("target", first(col("content")).over(wTgt))
      .groupBy("l_orderkey")
      .agg(min(when(col("content") === col("target"), col("l_linenumber")))
        .as("matched_linenumber"))
      .orderBy("l_orderkey")
  }

  // ---------------------------------------------------------------- Q09
  /** A3/W2: grouped fixed-n seeded sampling — 15 per nation
    * (`utils.py:9-29`, used by `setup/test_splits.py:6-24`). */
  val q09 = DeclaredQuery(
    "q09_grouped_sample",
    Some(s"""SELECT c_nationkey, c_custkey, rk FROM (
            |  SELECT c_nationkey, c_custkey,
            |         row_number() OVER (PARTITION BY c_nationkey
            |           ORDER BY ${Det.sql.seededKey("42", "c_custkey")}, c_custkey) AS rk
            |  FROM customer)
            |WHERE rk <= 15 ORDER BY c_custkey""".stripMargin)) { (s, d) =>
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(Det.seededKey("42", col("c_custkey")), col("c_custkey"))
    Tables.customer(s, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 15)
      .select("c_nationkey", "c_custkey", "rk")
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- Q10
  /** A4/F7/F8/F12: per-group intensity stats + standardize + clamp + min-shift
    * (`transforms/utils.py:87-91`, `transforms/intensity.py:24-131`).
    * Stats come from exact integer cent sums; the standardize/clamp chain is
    * the same IEEE expression tree on both sides. */
  val q10 = DeclaredQuery(
    "q10_stats_standardize",
    Some("""WITH st AS (
           |  SELECT l_orderkey, l_linenumber,
           |         CAST(ROUND(l_extendedprice*100) AS BIGINT) AS c,
           |         COUNT(*) OVER (PARTITION BY l_orderkey) AS n,
           |         SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) OVER (PARTITION BY l_orderkey) AS s1,
           |         SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)*CAST(ROUND(l_extendedprice*100) AS BIGINT))
           |           OVER (PARTITION BY l_orderkey) AS s2,
           |         MIN(CAST(ROUND(l_extendedprice*100) AS BIGINT)) OVER (PARTITION BY l_orderkey) AS mn
           |  FROM lineitem),
           |ex AS (
           |  SELECT l_orderkey, l_linenumber, c, n, mn,
           |         CAST(s1 AS DOUBLE)/1e2/CAST(n AS DOUBLE) AS mean,
           |         CASE WHEN n > 1 THEN
           |           sqrt(greatest(
           |             (CAST(s2 AS DOUBLE)/1e4 - (CAST(s1 AS DOUBLE)/1e2)*(CAST(s1 AS DOUBLE)/1e2)/CAST(n AS DOUBLE))
           |               / CAST(n - 1 AS DOUBLE), 0.0))
           |         END AS sd
           |  FROM st)
           |SELECT l_orderkey, l_linenumber,
           |       CAST(c - mn AS DOUBLE)/1e2 AS shifted,
           |       CASE WHEN sd IS NOT NULL AND sd > 0.0
           |            THEN greatest(least((CAST(c AS DOUBLE)/1e2 - mean)/sd, 2.0), -2.0)
           |            ELSE 0.0 END AS standardized
           |FROM ex ORDER BY l_orderkey, l_linenumber, shifted, standardized""".stripMargin)) { (s, d) =>
    val w = Window.partitionBy(col("l_orderkey"))
    val st = li(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        Det.cents(col("l_extendedprice")).as("c"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1", sum(col("c")).over(w))
      .withColumn("s2", sum(col("c") * col("c")).over(w))
      .withColumn("mn", min(col("c")).over(w))
    val ex = st
      .withColumn("mean", col("s1").cast("double") / lit(1e2) / col("n").cast("double"))
      .withColumn("sd", when(col("n") > 1,
        sqrt(greatest(
          (col("s2").cast("double") / lit(1e4)
            - (col("s1").cast("double") / lit(1e2)) * (col("s1").cast("double") / lit(1e2)) / col("n").cast("double"))
            / (col("n") - 1).cast("double"), lit(0.0)))))
    ex.select(col("l_orderkey"), col("l_linenumber"),
      ((col("c") - col("mn")).cast("double") / lit(1e2)).as("shifted"),
      when(col("sd").isNotNull && col("sd") > 0.0,
        greatest(least((col("c").cast("double") / lit(1e2) - col("mean")) / col("sd"), lit(2.0)), lit(-2.0)))
        .otherwise(lit(0.0)).as("standardized"))
      .orderBy("l_orderkey", "l_linenumber", "shifted", "standardized")
  }

  // ---------------------------------------------------------------- Q11
  /** A5/A6: exploration sweep — mean / stddev_pop / 9-point nearest-rank
    * quantiles per group (`setup/exploration.py:84-100`; numpy std is
    * population std). Nearest-rank index is pinned to
    * floor(q*(n-1)+0.5)+1 on both sides; values are exact cents. */
  val q11 = DeclaredQuery(
    "q11_exploration_sweep", {
      val qdefs = Seq("0.0" -> "q00", "0.01" -> "q01", "0.05" -> "q05",
        "0.25" -> "q25", "0.5" -> "q50", "0.75" -> "q75",
        "0.95" -> "q95", "0.99" -> "q99", "1.0" -> "q100")
      val qcols = qdefs.map { case (q, nm) =>
        s"CAST(MAX(CASE WHEN rn = FLOOR($q*CAST(n-1 AS DOUBLE)+0.5)+1 THEN c END) AS DOUBLE)/1e2 AS $nm"
      }.mkString(",\n       ")
      Some(s"""WITH r AS (
              |  SELECT l_returnflag AS flag,
              |         CAST(ROUND(l_extendedprice*100) AS BIGINT) AS c,
              |         row_number() OVER (PARTITION BY l_returnflag ORDER BY CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS rn,
              |         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
              |  FROM lineitem)
              |SELECT flag, CAST(MAX(n) AS BIGINT) AS n,
              |       CAST(SUM(c) AS DOUBLE)/1e2/CAST(MAX(n) AS DOUBLE) AS mean,
              |       sqrt(greatest(CAST(SUM(c*c) AS DOUBLE)/1e4/CAST(MAX(n) AS DOUBLE)
              |         - (CAST(SUM(c) AS DOUBLE)/1e2/CAST(MAX(n) AS DOUBLE))*(CAST(SUM(c) AS DOUBLE)/1e2/CAST(MAX(n) AS DOUBLE)), 0.0)) AS stddev_pop,
              |       $qcols
              |FROM r GROUP BY flag ORDER BY flag""".stripMargin)
    }) { (s, d) =>
    import s.implicits._
    val qdefs = Seq(0.0 -> "q00", 0.01 -> "q01", 0.05 -> "q05",
      0.25 -> "q25", 0.5 -> "q50", 0.75 -> "q75",
      0.95 -> "q95", 0.99 -> "q99", 1.0 -> "q100")
    val base = li(s, d)
      .select(col("l_returnflag").as("flag"), Det.cents(col("l_extendedprice")).as("c"))
    // Exact nearest-rank quantiles WITHOUT ranking whole per-flag
    // partitions (3 groups = 3 giant single-reducer sorts at scale).
    // Bucketed CDF: prices live in a bounded domain → $1000-wide cent
    // buckets. ONE scan builds the per-(flag,bucket) counts AND the exact
    // moment sums (integer cents + decimal(38,0) squares are associative,
    // so bucket-level partials roll up to identical totals); the ≤few
    // hundred bucket rows are fetched and re-planted as a literal frame —
    // offsets/targets/stats all derive from it without rescanning.
    val bucketed = base.withColumn("_b", floor(col("c").cast("double") / 1e5).cast("long"))
    val baggPlan = bucketed.groupBy("flag", "_b").agg(
      count(lit(1)).as("_bn"),
      sum(col("c")).as("_bsc"),
      sum((col("c") * col("c")).cast(DecimalType(38, 0))).as("_bsc2"))
    // 2 flags × ≤ a few hundred 100k-wide price buckets
    val bagg = graft.util.Bounded.literalFrame(baggPlan, 4096, "price moment buckets")
    val stats = bagg.groupBy("flag").agg(
      sum(col("_bn")).as("n"),
      sum(col("_bsc")).as("_sc"),
      sum(col("_bsc2")).as("_sc2"))
    val wB = Window.partitionBy(col("flag")).orderBy(col("_b"))
    val boffs = bagg
      .withColumn("_off_lo", coalesce(
        sum(col("_bn")).over(wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_off_hi", col("_off_lo") + col("_bn"))
    val qdf = qdefs.toDF("q", "qname")
    val targets = stats.select(col("flag"), col("n")).crossJoin(broadcast(qdf))
      .withColumn("_rk", floor(col("q") * (col("n") - 1).cast("double") + 0.5) + 1)
    val located = targets.join(boffs, Seq("flag"))
      .filter(col("_rk") > col("_off_lo") && col("_rk") <= col("_off_hi"))
      .select(col("flag"), col("qname"), col("_b"),
        (col("_rk") - col("_off_lo")).as("_local_rk"))
    val needed = located.select("flag", "_b").distinct()
    // SECOND-SCAN PRUNING (VERDICT r12 item 8): the needed buckets are
    // known here from literal-frame arithmetic only (bagg is a collected
    // ≤4096-row local relation — no cluster scan happens in this collect),
    // and each bucket is a narrow $1000 band of the RAW price column. Push
    // an OR-of-ranges predicate on l_extendedprice into the re-scan so the
    // parquet reader drops non-quantile rows at decode (PushedFilters) and
    // row-group stats can prune on price-clustered layouts — the exact
    // (flag, _b) join below is unchanged (the ranges are a rounded
    // superset: c = round(price*100) ≥ b·10⁵ ⟺ price ≥ b·1000 − 0.005).
    val neededBs = graft.util.Bounded.rows(
        needed.select("_b").distinct(), 4096, "q11 needed quantile buckets")
      .map(_.getLong(0)).sorted
    val ranges = neededBs.foldLeft(Vector.empty[(Long, Long)]) { (acc, b) =>
      acc.lastOption match {
        case Some((lo, hi)) if b == hi + 1 => acc.init :+ ((lo, b))
        case _ => acc :+ ((b, b))
      }
    }
    // empty input → no located buckets → scan nothing (lit(false)), the
    // same empty result frame as before the pushdown existed
    val pricePred =
      if (neededBs.isEmpty) lit(false)
      else (if (ranges.length > 64) Vector((neededBs.min, neededBs.max)) else ranges)
        .map { case (lo, hi) =>
          col("l_extendedprice") >= lit(lo * 1000.0 - 0.01) &&
            col("l_extendedprice") <= lit((hi + 1) * 1000.0 + 0.01)
        }.reduce(_ || _)
    val rescanned = li(s, d).filter(pricePred)
      .select(col("l_returnflag").as("flag"), Det.cents(col("l_extendedprice")).as("c"))
      .withColumn("_b", floor(col("c").cast("double") / 1e5).cast("long"))
    val wIn = Window.partitionBy(col("flag"), col("_b")).orderBy(col("c"))
    val vals = rescanned.join(broadcast(needed), Seq("flag", "_b"))
      .withColumn("_lrn", row_number().over(wIn))
      .join(broadcast(located), Seq("flag", "_b"))
      .filter(col("_lrn") === col("_local_rk"))
      .select(col("flag"), col("qname"), (col("c").cast("double") / lit(1e2)).as("_qv"))
    val qAggs = qdefs.map { case (_, nm) =>
      max(when(col("qname") === nm, col("_qv"))).as(nm)
    }
    val quants = vals.groupBy("flag").agg(qAggs.head, qAggs.tail: _*)
    val meanE = col("_sc").cast("double") / lit(1e2) / col("n").cast("double")
    val outCols: Seq[Column] =
      col("flag") +: col("n") +: meanE.as("mean") +:
        sqrt(greatest(
          col("_sc2").cast("double") / lit(1e4) / col("n").cast("double")
            - meanE * meanE, lit(0.0))).as("stddev_pop") +:
        qdefs.map { case (_, nm) => col(nm) }
    stats.join(quants, Seq("flag"))
      .select(outCols: _*)
      .orderBy("flag")
  }

  // ---------------------------------------------------------------- Q12
  /** A7/F4: distinct sorted value set per group, joined to one string —
    * `torch.unique` + `"_".join(classes)` shape
    * (`transforms/utils.py:136-141`). */
  val q12 = DeclaredQuery(
    "q12_distinct_set",
    Some("""SELECT o_custkey,
           |       array_to_string(list_sort(list(DISTINCT o_orderpriority)), '_') AS priorities,
           |       COUNT(*) AS n_orders
           |FROM orders GROUP BY o_custkey ORDER BY o_custkey NULLS FIRST""".stripMargin)) { (s, d) =>
    Tables.orders(s, d).groupBy("o_custkey")
      .agg(array_join(array_sort(collect_set(col("o_orderpriority"))), "_").as("priorities"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")
  }

  // ---------------------------------------------------------------- Q13
  /** A8/A9: ED/ES detection shape — argmax/argmin of a conditional count
    * with pinned tiebreaks (`setup/reformat/utils.py:91-113`). Implemented
    * as rank-1 rows of two explicit orderings (deterministic, unlike bare
    * max_by on ties). */
  val q13 = DeclaredQuery(
    "q13_argmax_argmin",
    Some("""WITH cnt AS (
           |  SELECT o.o_custkey, l.l_orderkey,
           |         CAST(SUM(CASE WHEN l.l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS big_lines
           |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           |  GROUP BY o.o_custkey, l.l_orderkey),
           |r AS (
           |  SELECT o_custkey, l_orderkey, big_lines,
           |         row_number() OVER (PARTITION BY o_custkey ORDER BY big_lines DESC, l_orderkey) AS rk_ed,
           |         row_number() OVER (PARTITION BY o_custkey ORDER BY big_lines ASC,  l_orderkey) AS rk_es
           |  FROM cnt)
           |SELECT o_custkey,
           |       MAX(CASE WHEN rk_ed = 1 THEN l_orderkey END) AS ed_orderkey,
           |       MAX(CASE WHEN rk_ed = 1 THEN big_lines END) AS ed_count,
           |       MAX(CASE WHEN rk_es = 1 THEN l_orderkey END) AS es_orderkey,
           |       MAX(CASE WHEN rk_es = 1 THEN big_lines END) AS es_count
           |FROM r GROUP BY o_custkey ORDER BY o_custkey NULLS FIRST""".stripMargin)) { (s, d) =>
    // fact-fact join (lineitem ⋈ orders): shuffle on the join key, never
    // broadcast — orders is ~1.5M × SF rows.
    val cnt = li(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey", "l_orderkey")
      .agg(sum(when(col("l_quantity") > 25, 1).otherwise(0)).cast("long").as("big_lines"))
    // r18 (guide §2.3): the two rank-1 windows each sorted every
    // (custkey, orderkey) row twice (desc and asc orderings) before a
    // final agg threw away all but rank 1. The winners are plain
    // argmax/argmin with integer tie-breaks, so struct extrema compute
    // them in ONE map-side-combinable hash-agg, no sorts:
    //   rk_ed=1 ⇔ max big_lines, ties → MIN orderkey ⇔ max(struct(big,
    //   -orderkey)); rk_es=1 ⇔ min(struct(big, orderkey)).
    // (-orderkey cannot overflow: orderkeys are positive.) Identical
    // integer results; oracle unchanged.
    cnt.groupBy("o_custkey")
      .agg(max(struct(col("big_lines"), (-col("l_orderkey")).as("nk"))).as("_ed"),
        min(struct(col("big_lines"), col("l_orderkey").as("k"))).as("_es"))
      .select(col("o_custkey"),
        (-col("_ed.nk")).as("ed_orderkey"), col("_ed.big_lines").as("ed_count"),
        col("_es.k").as("es_orderkey"), col("_es.big_lines").as("es_count"))
      .orderBy("o_custkey")
  }

  // ---------------------------------------------------------------- Q14
  /** A10/W1/F10: 256-bin histogram + cumulative CDF + hist-eq remap
    * (`visualization/utils.py:39-46`). Bucketing is pure integer arithmetic
    * (exact on both engines); the CDF normalization divides exact integers. */
  val q14 = DeclaredQuery(
    "q14_histogram_cdf",
    Some("""WITH b AS (
           |  SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS c,
           |         MIN(CAST(ROUND(l_extendedprice*100) AS BIGINT)) OVER () AS mn,
           |         MAX(CAST(ROUND(l_extendedprice*100) AS BIGINT)) OVER () AS mx,
           |         COUNT(*) OVER () AS total
           |  FROM lineitem),
           |h AS (
           |  SELECT ((c - mn) * 256) // (mx - mn + 1) AS bucket,
           |         MAX(total) AS total, COUNT(*) AS cnt
           |  FROM b GROUP BY 1),
           |w AS (
           |  SELECT bucket, cnt, total,
           |         SUM(cnt) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM h),
           |m AS (SELECT *, MIN(cum) OVER () AS cmin FROM w)
           |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(cnt AS BIGINT) AS cnt,
           |       CAST(cum AS BIGINT) AS cum,
           |       CAST(cum - cmin AS DOUBLE)/CAST(total - cmin AS DOUBLE) AS cdf,
           |       CAST(ROUND(255.0 * CAST(cum - cmin AS DOUBLE)/CAST(total - cmin AS DOUBLE)) AS BIGINT) AS eq_level
           |FROM m ORDER BY bucket""".stripMargin)) { (s, d) =>
    val c = Det.cents(col("l_extendedprice"))
    val base = li(s, d).select(c.as("c"))
    val stats = base.agg(min(col("c")).as("mn"), max(col("c")).as("mx"),
      count(lit(1)).as("total"))
    val h = base.crossJoin(broadcast(stats))
      .withColumn("bucket", expr("(c - mn) * 256 DIV (mx - mn + 1)"))
      .groupBy("bucket")
      .agg(max(col("total")).as("total"), count(lit(1)).as("cnt"))
    // post-agg frame is ≤256 bucket rows — a deliberate (non-foldable)
    // single-partition key keeps the window defined at identical semantics
    val one = Ranks.onePartition(col("bucket"))
    val wcum = Window.partitionBy(one).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = h.withColumn("cum", sum(col("cnt")).over(wcum))
      .withColumn("cmin", min(col("cum")).over(Window.partitionBy(one)))
    val cdf = (col("cum") - col("cmin")).cast("double") / (col("total") - col("cmin")).cast("double")
    withCum.select(col("bucket").cast("long").as("bucket"),
      col("cnt").cast("long").as("cnt"),
      col("cum").cast("long").as("cum"),
      cdf.as("cdf"),
      round(lit(255.0) * cdf, 0).cast("long").as("eq_level"))
      .orderBy("bucket")
  }

  // ---------------------------------------------------------------- Q16
  /** W2/W4/O2/O3/U4/F14: DICOM ordering shape — natural-sort key on
    * filenames (`setup/reformat/utils.py:139-149`), slice index =
    * dense_rank of projected position descending (`utils.py:218-241`),
    * projection = dot(pos, cross(o1,o2)) with integer vectors
    * (`utils.py:229-233`; cross(2,1,0 × 0,1,1) = (1,-2,2)). */
  val q16 = DeclaredQuery(
    "q16_dicom_order",
    Some("""WITH f AS (
           |  SELECT p_partkey,
           |         'img' || CAST(p_partkey % 97 AS VARCHAR) || '_f' || CAST(p_partkey AS VARCHAR) AS fname,
           |         p_size*1 + (p_partkey % 7)*(-2) + (p_partkey % 5)*2 AS proj
           |  FROM part),
           |k AS (
           |  SELECT p_partkey, fname, proj,
           |         CAST(regexp_extract(fname, '([0-9]+)', 1) AS BIGINT) AS nat1,
           |         CAST(regexp_extract(fname, '_f([0-9]+)', 1) AS BIGINT) AS nat2
           |  FROM f)
           |SELECT p_partkey, fname, nat1, nat2, proj,
           |       dense_rank() OVER (ORDER BY proj DESC) AS slice_index,
           |       row_number() OVER (ORDER BY nat1, nat2, p_partkey) AS file_order
           |FROM k ORDER BY p_partkey""".stripMargin)) { (s, d) =>
    val f = Tables.part(s, d).select(
      col("p_partkey"),
      concat(lit("img"), (col("p_partkey") % 97).cast("string"),
        lit("_f"), col("p_partkey").cast("string")).as("fname"),
      (col("p_size") * 1 + (col("p_partkey") % 7) * -2 + (col("p_partkey") % 5) * 2).as("proj"))
    val k = f
      .withColumn("nat1", regexp_extract(col("fname"), "([0-9]+)", 1).cast("long"))
      .withColumn("nat2", regexp_extract(col("fname"), "_f([0-9]+)", 1).cast("long"))
    // slice_index: the projection domain is bounded (slice positions per
    // series), so dense_rank = a driver-built value→rank map, no window.
    // file_order: two-phase rank bucketed by the bounded leading key nat1.
    val sliced = Ranks.globalDenseRank(k, col("proj"), descending = true, "slice_index")
    // bucket must be non-null (Ranks' offset map rejects null keys): a
    // digitless fname extracts "" → null nat1. Unreachable for this
    // synthesized fname (always has digits), but align the guard with the
    // ORACLE's semantics anyway: DuckDB's row_number ORDER BY nat1 sorts
    // NULLS LAST, so bucket nulls to Long.MaxValue and order nulls-last —
    // Spark and oracle agree even if a null ever becomes reachable.
    Ranks.globalRowNumber(sliced, coalesce(col("nat1"), lit(Long.MaxValue)),
        Seq(col("nat1").asc_nulls_last, col("nat2"), col("p_partkey")), "file_order")
      .orderBy("p_partkey")
  }

  // ---------------------------------------------------------------- Q17
  /** W3/F9: group-relative renumber — frame_nr = (frame − ED) mod total
    * (`dataset_cacher.py:357-358`), ED = rank-1 row of an explicit ordering. */
  val q17 = DeclaredQuery(
    "q17_frame_renumber",
    Some("""WITH e AS (
           |  SELECT l_orderkey, l_linenumber,
           |         COUNT(*) OVER (PARTITION BY l_orderkey) AS n,
           |         row_number() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC, l_linenumber) AS rk
           |  FROM lineitem),
           |ed AS (SELECT l_orderkey, l_linenumber AS ed_ln FROM e WHERE rk = 1)
           |SELECT e.l_orderkey, e.l_linenumber,
           |       ((e.l_linenumber - ed.ed_ln) % e.n + e.n) % e.n AS frame_nr
           |FROM e JOIN ed ON e.l_orderkey = ed.l_orderkey
           |ORDER BY e.l_orderkey, e.l_linenumber""".stripMargin)) { (s, d) =>
    // ED lookup as a windowed first() — no self-join; both windows share
    // the l_orderkey partitioning (one exchange total)
    val w = Window.partitionBy(col("l_orderkey"))
    li(s, d).select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("ed_ln", first(col("l_linenumber"))
        .over(w.orderBy(col("l_quantity").desc, col("l_linenumber"))))
      .select(col("l_orderkey"), col("l_linenumber"),
        pmod(col("l_linenumber") - col("ed_ln"), col("n")).as("frame_nr"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // ---------------------------------------------------------------- Q18
  /** O4/R3: seeded random limit-n subset (`data_predictor.py:178-184`) +
    * shuffle/batch grouping with drop_last (`data_module.py:158-166`).
    * Spark executes orderBy+limit as distributed TakeOrdered — no global
    * sort materializes at scale. */
  val q18 = DeclaredQuery(
    "q18_seeded_limit",
    Some(s"""WITH r AS (
            |  SELECT o_orderkey, o_totalprice,
            |         row_number() OVER (ORDER BY ${Det.sql.seededKey("7", "o_orderkey")}, o_orderkey) AS rn
            |  FROM orders)
            |SELECT o_orderkey, o_totalprice, rn, (rn - 1) // 32 AS batch_id
            |FROM r WHERE rn <= 192
            |ORDER BY o_orderkey""".stripMargin)) { (s, d) =>
    val key = Det.seededKey("7", col("o_orderkey"))
    val top = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), key.as("k"))
      .orderBy(col("k"), col("o_orderkey"))
      .limit(192) // 6 complete batches of 32 (drop_last on a 200-row draw)
    // rank only the 192 limit survivors (TakeOrdered upstream) — tiny
    // window on a deliberate single-partition key
    top.withColumn("rn", row_number().over(
      Window.partitionBy(Ranks.onePartition(col("o_orderkey")))
        .orderBy(col("k"), col("o_orderkey"))))
      .withColumn("batch_id", expr("(rn - 1) DIV 32"))
      .select("o_orderkey", "o_totalprice", "rn", "batch_id")
      .orderBy("o_orderkey")
  }

  // ---------------------------------------------------------------- Q19
  /** U3: union-by-name across heterogeneous schemas, missing columns → null
    * (`dataset_cacher.py:296-311` pd.concat shape). */
  val q19 = DeclaredQuery(
    "q19_union_byname",
    Some("""SELECT * FROM (
           |  SELECT c_custkey AS k, c_mktsegment AS segment FROM customer WHERE c_nationkey < 12
           |  UNION ALL BY NAME
           |  SELECT c_custkey + 1000000 AS k, c_acctbal AS acctbal FROM customer WHERE c_nationkey >= 12)
           |ORDER BY k""".stripMargin)) { (s, d) =>
    val c = Tables.customer(s, d)
    val a = c.filter(col("c_nationkey") < 12)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("segment"))
    val b = c.filter(col("c_nationkey") >= 12)
      .select((col("c_custkey") + 1000000).as("k"), col("c_acctbal").as("acctbal"))
    a.unionByName(b, allowMissingColumns = true).orderBy("k")
  }

  // ---------------------------------------------------------------- Q20
  /** U-ext: INTERSECT / EXCEPT of key sets from two predicates
    * (completes the set-op surface; reference only has union/difference,
    * `data_split.py:43-67`). */
  val q20 = DeclaredQuery(
    "q20_setops",
    Some("""SELECT tag, k FROM (
           |  SELECT 'both' AS tag, c_custkey AS k FROM (
           |    SELECT c_custkey FROM customer WHERE c_acctbal > 0
           |    INTERSECT
           |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
           |  UNION ALL
           |  SELECT 'only_pos' AS tag, c_custkey AS k FROM (
           |    SELECT c_custkey FROM customer WHERE c_acctbal > 0
           |    EXCEPT
           |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'))
           |ORDER BY tag, k""".stripMargin)) { (s, d) =>
    val c = Tables.customer(s, d)
    val pos = c.filter(col("c_acctbal") > 0).select(col("c_custkey"))
    val bld = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val both = pos.intersect(bld).select(lit("both").as("tag"), col("c_custkey").as("k"))
    val onlyPos = pos.except(bld).select(lit("only_pos").as("tag"), col("c_custkey").as("k"))
    both.unionByName(onlyPos).orderBy("tag", "k")
  }

  // ---------------------------------------------------------------- Q21
  /** F5: cache-identity fingerprint — md5 over the sorted member list per
    * group (`dataset_cacher.py:103-127`). */
  val q21 = DeclaredQuery(
    "q21_fingerprint",
    Some("""SELECT c_nationkey,
           |       md5(array_to_string(list_sort(list(c_name)), ',')) AS fp,
           |       COUNT(*) AS n
           |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey NULLS FIRST""".stripMargin)) { (s, d) =>
    Tables.customer(s, d).groupBy("c_nationkey")
      .agg(md5(concat_ws(",", array_sort(collect_list(col("c_name"))))).as("fp"),
        count(lit(1)).as("n"))
      .orderBy("c_nationkey")
  }

  // ---------------------------------------------------------------- Q22
  /** X6: ROLLUP revenue — grouping-sets surface. Revenue is exact integer
    * arithmetic: cents × (100 − discount_pct) summed as integers, one final
    * division (associative → partition-order-proof at any scale). */
  val q22 = DeclaredQuery(
    "q22_rollup_revenue",
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS flag,
           |       COALESCE(l_linestatus, 'ALL') AS status,
           |       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
           |                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS DOUBLE)/1e4 AS revenue,
           |       COUNT(*) AS n
           |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
           |ORDER BY flag, status""".stripMargin)) { (s, d) =>
    li(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg((sum(Det.cents(col("l_extendedprice")) * (lit(100) - Det.cents(col("l_discount"))))
        .cast("double") / lit(1e4)).as("revenue"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("revenue"), col("n"))
      .orderBy("flag", "status")
  }

  // ---------------------------------------------------------------- Q23
  /** X7: approximate distinct count — per-returnflag KMV sketch
    * ([[graft.operators.KmvSketch]]), the oracle-decidable replacement for
    * the rounds-1–8 HLL posture. HLL sketches (Spark's
    * `approx_count_distinct`) are engine-internal and can only ever be
    * tolerance-checked; the KMV estimate is a pure function of the k
    * smallest md5-derived 60-bit hashes, which DuckDB reproduces exactly
    * (hex → integer by positional arithmetic, [[graft.util.Det.sql.hex60]]),
    * so all three gate checks (rows/schema/hash) apply. Exact count rides
    * along for the relative-error column. */
  val q23 = DeclaredQuery(
    "q23_approx_distinct",
    Some(s"""WITH h AS (SELECT DISTINCT l_returnflag AS flag,
            |                  md5(CAST(l_partkey AS VARCHAR)) AS h FROM lineitem),
            |v AS (SELECT DISTINCT flag, ${Det.sql.hex60("h")} AS hv FROM h),
            |r AS (SELECT flag, hv,
            |             row_number() OVER (PARTITION BY flag ORDER BY hv) AS rk,
            |             COUNT(*) OVER (PARTITION BY flag) AS nd FROM v),
            |kth AS (SELECT flag, nd, hv AS kv FROM r WHERE rk = LEAST(nd, 64)),
            |est AS (SELECT flag,
            |               CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
            |                    ELSE 63e0 * 1152921504606846976 / CAST(kv AS DOUBLE)
            |               END AS approx_parts,
            |               LEAST(nd, 64) AS support FROM kth),
            |ex AS (SELECT l_returnflag AS flag,
            |              COUNT(DISTINCT l_partkey) AS exact_parts
            |       FROM lineitem GROUP BY 1)
            |SELECT est.flag, est.approx_parts, est.support, ex.exact_parts,
            |       abs(est.approx_parts - ex.exact_parts) / ex.exact_parts AS rel_err
            |FROM est JOIN ex ON est.flag = ex.flag
            |ORDER BY est.flag""".stripMargin)) { (s, d) =>
    import graft.operators.KmvSketch
    // Pre-compact to distinct (flag, partkey) BEFORE the typed KMV
    // aggregator (the q15 pattern, VERDICT r16 item 5): the sketch is a
    // pure function of the distinct hv set and hv is a pure function of
    // partkey, so a codegen hash-agg distinct bounds the encoder-boundary
    // rows by |part| (~2M at sf10) instead of |lineitem| (~60M) — and it
    // replaces countDistinct's Expand plan with a plain count(*) in the
    // same pass. Result unchanged by construction.
    li(s, d)
      .select(col("l_returnflag").as("flag"), col("l_partkey"))
      .distinct()
      .select(col("flag"),
        Det.hex60(md5(col("l_partkey").cast("string"))).as("hv"))
      .groupBy("flag")
      .agg(KmvSketch(col("hv")).as("kmv"),
        count(lit(1)).as("exact_parts"))
      .select(col("flag"),
        col("kmv.estimate").as("approx_parts"),
        col("kmv.support").as("support"),
        col("exact_parts"),
        (abs(col("kmv.estimate") - col("exact_parts")) / col("exact_parts"))
          .as("rel_err"))
      .orderBy("flag")
  }

  // ---------------------------------------------------------------- Q94
  /** X58: histogram quantiles — per-group p50/p90/p99 extracted from a
    * 256-bucket equi-width histogram by inverse-CDF lookup. The 100 TB
    * quantile path: q11's exact quantiles sort each group (fine for a
    * report, wrong for a corpus); here the data passes through two
    * hash-aggs (per-group stats, per-bucket counts — both map-side
    * combinable), the cumulative window runs on the ≤256-row post-agg
    * frame per group, and the answer is the target bucket's exact lower
    * bound. All rank/bound arithmetic is integer (cents, ceil via
    * `(a+b-1) DIV b`) so both engines agree bit-for-bit.
    *
    * Scale note: one broadcast of the G-row stats frame, one shuffle of
    * ≤G·256 bucket rows; never a per-group sort. */
  val q94 = DeclaredQuery(
    "q94_histogram_quantiles",
    Some("""WITH b AS (SELECT l_returnflag AS flag, CAST(ROUND(l_extendedprice*100) AS BIGINT) AS c FROM lineitem),
           |s AS (SELECT flag, MIN(c) AS mn, MAX(c) AS mx, COUNT(*) AS n FROM b GROUP BY 1),
           |h AS (SELECT b.flag, (c - mn) * 256 // (mx - mn + 1) AS bucket, COUNT(*) AS cnt,
           |             MAX(mn) AS mn, MAX(mx) AS mx, MAX(n) AS n
           |      FROM b JOIN s ON b.flag = s.flag GROUP BY 1, 2),
           |w AS (SELECT *, SUM(cnt) OVER (PARTITION BY flag ORDER BY bucket
           |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |      FROM h),
           |q AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100)) AS t(qlabel, num, den)),
           |p AS (SELECT flag, qlabel, MIN(bucket) AS bucket, MAX(mn) AS mn, MAX(mx) AS mx
           |      FROM w CROSS JOIN q
           |      WHERE cum >= (num * n + den - 1) // den
           |      GROUP BY 1, 2)
           |SELECT flag, qlabel, CAST(bucket AS BIGINT) AS bucket,
           |       CAST(mn + (bucket * (mx - mn + 1) + 255) // 256 AS DOUBLE)/1e2 AS approx_value
           |FROM p ORDER BY flag, qlabel""".stripMargin)) { (s, d) =>
    import s.implicits._
    val base = li(s, d)
      .select(col("l_returnflag").as("flag"), Det.cents(col("l_extendedprice")).as("c"))
    val stats = base.groupBy("flag")
      .agg(min(col("c")).as("mn"), max(col("c")).as("mx"), count(lit(1)).as("n"))
    val h = base.join(broadcast(stats), "flag")
      .withColumn("bucket", expr("(c - mn) * 256 DIV (mx - mn + 1)"))
      .groupBy(col("flag"), col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        max(col("mn")).as("mn"), max(col("mx")).as("mx"), max(col("n")).as("n"))
    // post-agg frame: ≤256 rows per group — bounded cumulative window
    val wcum = Window.partitionBy(col("flag")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qf = Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L))
      .toDF("qlabel", "num", "den")
    h.withColumn("cum", sum(col("cnt")).over(wcum))
      .crossJoin(broadcast(qf))
      .filter(col("cum") >= expr("(num * n + den - 1) DIV den"))
      .groupBy(col("flag"), col("qlabel"))
      .agg(min(col("bucket")).as("bucket"), max(col("mn")).as("mn"), max(col("mx")).as("mx"))
      .select(col("flag"), col("qlabel"), col("bucket").cast("long").as("bucket"),
        Det.unCents(col("mn") + expr("(bucket * (mx - mn + 1) + 255) DIV 256"))
          .as("approx_value"))
      .orderBy("flag", "qlabel")
  }

  // ---------------------------------------------------------------- Q123
  /** X87: mergeable quantile sketch — the bounded-state quantile
    * estimator completing the sketch family (KMV distinct = q23,
    * CMS frequency = q81, Bloom membership = q82, quantiles = this).
    * The state is the k rows with the SMALLEST seeded row hashes — a
    * deterministic uniform sample both engines reconstruct exactly
    * (the KMV trick pointed at order statistics instead of
    * cardinality). Mergeable by construction: bottom-k of a union is
    * the bottom-k of each shard's bottom-k (SketchSpec pins the law);
    * a 1000-executor corpus ships k rows per partition, never data.
    *
    * Plan: one scan computing (value, md5) — hash inputs are INTEGERS
    * (cents / rounded quantity), never raw doubles, so the text both
    * engines hash is identical — then a distributed TakeOrdered for
    * the global bottom-k (no global window; PlanAuditSpec's rule), and
    * the quantile read-off is `sort_array` over the k-row state. The
    * estimate at p is the order statistic at ⌊p·(n−1)⌋+1, the same
    * integer arithmetic in the oracle.
    */
  val q123 = DeclaredQuery(
    "q123_quantile_sketch",
    Some("""WITH r AS (SELECT l_extendedprice AS v,
           |              md5(concat_ws(':', CAST(l_orderkey AS VARCHAR),
           |                    CAST(l_linenumber AS VARCHAR),
           |                    CAST(CAST(ROUND((l_extendedprice)*100) AS BIGINT) AS VARCHAR),
           |                    CAST(CAST(ROUND(l_quantity) AS BIGINT) AS VARCHAR),
           |                    'qsk1')) AS h
           |       FROM lineitem),
           |s AS (SELECT v, h FROM r ORDER BY h LIMIT 1024),
           |o AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, h) AS i,
           |             COUNT(*) OVER () AS n FROM s)
           |SELECT q.p, o.v AS estimate, o.n AS sample_n
           |FROM (VALUES (0.10),(0.25),(0.50),(0.75),(0.90)) q(p)
           |JOIN o ON o.i = CAST(FLOOR(q.p * (o.n - 1)) AS BIGINT) + 1
           |ORDER BY 1""".stripMargin)) { (s, d) =>
    val k = 1024
    val rows = Tables.lineitem(s, d).select(
      col("l_extendedprice").as("v"),
      md5(concat_ws(":",
        col("l_orderkey").cast("string"),
        col("l_linenumber").cast("string"),
        Det.cents(col("l_extendedprice")).cast("string"),
        round(col("l_quantity"), 0).cast("long").cast("string"),
        lit("qsk1"))).as("h"))
    val state = rows.orderBy("h").limit(k)
      .agg(sort_array(collect_list(struct(col("v"), col("h")))).as("st"),
        count(lit(1)).as("n"))
    val ps = Seq(0.10, 0.25, 0.50, 0.75, 0.90)
    state.select(explode(array(ps.map(p =>
        struct(lit(p).as("p"),
          element_at(col("st"),
            (floor(lit(p) * (col("n") - 1)) + 1).cast("int"))
            .getField("v").as("estimate"),
          col("n").as("sample_n"))): _*)).as("q"))
      .select(col("q.p"), col("q.estimate"), col("q.sample_n"))
      .orderBy("p")
  }

  // ---------------------------------------------------------------- Q126
  /** X90: Pareto frontier (skyline) — the DISTINCT (price, quantity)
    * points not dominated by any other (lower-or-equal price AND
    * higher-or-equal quantity, one strict). The multi-objective
    * optimization primitive ("cheapest for its volume") that naively
    * needs an ordered global scan.
    *
    * Plan — the third instance of the engine's ordered-global-scan-
    * without-a-global-window recipe (q65's NTILE, q118's RFM): the
    * frontier test at a point is `qty > max(qty over all points with
    * strictly smaller (price, qty desc) order position`. That prefix
    * max splits into (a) a WITHIN-bucket running max over a monotone
    * bounded price bucket (digit-count·lead-2 — partitioned window),
    * plus (b) the max over all EARLIER buckets — a ≤2k-entry literal
    * map built from one bucket-count-sized job (bound require()d, the
    * Ranks.DenseRankMaxKeys discipline). No global window; the scan
    * stays fully parallel.
    */
  val q126 = DeclaredQuery(
    "q126_pareto_frontier",
    Some("""WITH pts AS (SELECT DISTINCT
           |               CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_c,
           |               CAST(ROUND(l_quantity) AS BIGINT) AS qty
           |             FROM lineitem),
           |f AS (SELECT *, MAX(qty) OVER
           |        (ORDER BY price_c, qty DESC
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           |        AS best_before
           |      FROM pts)
           |SELECT CAST(price_c AS DOUBLE)/1e2 AS price, qty
           |FROM f WHERE best_before IS NULL OR qty > best_before
           |ORDER BY 1, 2""".stripMargin)) { (s, d) =>
    // dominance pre-filter: at equal price only the MAX-qty point can
    // survive (any other is dominated by it), so a hash-agg replaces
    // DISTINCT and the frontier scan shrinks to one point per distinct
    // price — provably the same frontier the oracle's full-distinct
    // window computes (hash-green before and after this cut; sf10 wall
    // 16.5 s → remeasured below in BASELINE)
    val pts = Tables.lineitem(s, d).select(
      Det.cents(col("l_extendedprice")).as("price_c"),
      round(col("l_quantity"), 0).cast("long").as("qty"))
      .groupBy("price_c").agg(max(col("qty")).as("qty"))
    val pStr = col("price_c").cast("string")
    // r19 persist: the bucket-map collect below and the frontier window
    // both consume this lineitem-sized agg — the collect fills the cache
    // serially (the Ranks.globalRowNumberWithCount posture)
    val withB = pts.withColumn("b",
      (length(pStr) * 100 + substring(pStr, 1, 2).cast("long")).cast("long"))
      .persist()
    // (a) within-bucket running max over (price, qty desc), prior rows only
    val w = Window.partitionBy(col("b"))
      .orderBy(col("price_c"), col("qty").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val inBucket = withB.withColumn("run", max(col("qty")).over(w))
    // (b) prefix max over earlier buckets — bucket-count-sized driver fold
    val bm = withB.groupBy("b").agg(max(col("qty")).as("m"))
      .orderBy("b").collect()
    require(bm.length <= 10000,
      s"${bm.length} price buckets — the bucket map must stay literal-sized")
    var acc = Long.MinValue
    val entries: Array[org.apache.spark.sql.Column] = bm.flatMap { r =>
      val pre = acc; acc = math.max(acc, r.getLong(1))
      Seq(lit(r.getLong(0)), lit(if (pre == Long.MinValue) -1L else pre))
    }
    val pre =
      if (entries.isEmpty) lit(-1L)
      else element_at(map(entries.toSeq: _*), col("b"))
    inBucket
      .filter(col("qty") > greatest(coalesce(col("run"), lit(-1L)), pre))
      .select(Det.unCents(col("price_c")).as("price"), col("qty"))
      .orderBy("price", "qty")
  }

  // ---------------------------------------------------------------- Q129
  /** X93: CUBE with GROUPING ids — the full grouping-sets lattice
    * (q22 covers ROLLUP's prefix chain; CUBE is all 2² subsets), with
    * `GROUPING()` bits composed into the standard grouping id so
    * consumers can tell a real NULL from a subtotal row. Revenue rides
    * exact cents. Spark plans this as ONE expand (4 rows per input) +
    * one hash-agg — no re-scan per grouping set; same at any scale.
    */
  val q129 = DeclaredQuery(
    "q129_cube",
    Some("""SELECT COALESCE(l_returnflag, '(all)') AS rflag,
           |       COALESCE(l_linestatus, '(all)') AS lstatus,
           |       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
           |         AS gid,
           |       COUNT(*) AS n,
           |       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT))
           |            AS DOUBLE)/1e2 AS revenue
           |FROM lineitem
           |GROUP BY CUBE (l_returnflag, l_linestatus)
           |ORDER BY 3, 1, 2""".stripMargin)) { (s, d) =>
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("long").as("gid"),
        count(lit(1)).as("n"),
        Det.unCents(sum(Det.cents(col("l_extendedprice")))).as("revenue"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("rflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("lstatus"),
        col("gid"), col("n"), col("revenue"))
      .orderBy("gid", "rflag", "lstatus")
  }

  val all: Seq[DeclaredQuery] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13, q14,
    q16, q17, q18, q19, q20, q21, q22, q23, q94, q123, q126, q129, q141)
}
