package graft.queries

import graft.DeclaredQuery
import graft.multimodal.Phash
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual VIDEO dedup (round-9: composes the q70 image-pHash chain
  * with frame sampling — the missing member of the near-dup family
  * q27/q28/q44/q70/q71): sample 4 evenly-spaced frames per video, pHash
  * each sampled frame with the q70 integer fixed-point DCT, band each
  * slot's hash through the q44 machinery ((slot, k, 16-bit band) bucket
  * join), and score candidate pairs by SLOT-ALIGNED summed hamming.
  * Pair work is Σ(bucket²) per slot — never n² in videos.
  *
  * The declared corpus is GENERATED inside the query (oracle replays
  * pixel gen, DCT, banding, and scoring bit-for-bit in SQL): 100 base
  * videos × 2 variants; a video is 16 frames of 32×32 md5-derived luma,
  * the variant adds +1 to ~1/16 of each frame's pixels. The sampling
  * contract (take 4 of 16 → stride 4 → frames 0,4,8,12) is the same
  * n/take rule as `Multimodal.decodeVideo`/`VideoHash.frameHashes`.
  * Real video bytes take the production path instead: AVI demux →
  * per-sampled-frame JPEG decode → integer luma → `Phash.downscale` →
  * `Phash.hash` (`multimodal/VideoHash`; VideoHashSpec pins the muxed
  * AVI round-trip against this same grid construction).
  */
object VideoQueries {

  private val Videos = 200   // 100 near-dup pairs
  private val Slots = 4      // sampled frames per video
  private val Stride = 4     // 16-frame videos, take 4 → frames 0,4,8,12
  private val HammingMax = 40 // ≤10 per slot, q70's per-image bound

  private def basisSql: String =
    Phash.basis.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")

  private def basisCol: Column =
    array(Phash.basis.map(r => array(r.map(lit): _*)): _*)

  // ---------------------------------------------------------------- Q75
  val q75 = DeclaredQuery(
    "q75_video_phash_neardup",
    Some(s"""WITH vids AS (SELECT CAST(range AS BIGINT) AS vid FROM range(0, $Videos)),
            |slots AS (SELECT CAST(range AS INTEGER) AS slot FROM range(0, $Slots)),
            |cb AS (SELECT $basisSql AS c),
            |px0 AS (
            |  SELECT vid, slot, x, y,
            |         md5(concat_ws(':', CAST(vid // 2 AS VARCHAR),
            |                            CAST(slot * $Stride AS VARCHAR),
            |                            CAST(x AS VARCHAR), CAST(y AS VARCHAR), 'vpx')) AS h,
            |         CASE WHEN vid % 2 = 1 AND substr(md5(concat_ws(':',
            |                CAST(vid // 2 AS VARCHAR), CAST(slot * $Stride AS VARCHAR),
            |                CAST(x AS VARCHAR), CAST(y AS VARCHAR), 'vn')), 1, 1) = '0'
            |              THEN 1 ELSE 0 END AS noise
            |  FROM vids, slots, range(0, 32) tx(x), range(0, 32) ty(y)),
            |px AS (
            |  SELECT vid, slot, x, y,
            |         (ascii(substr(h, 1, 1)) - CASE WHEN ascii(substr(h, 1, 1)) >= 97 THEN 87 ELSE 48 END) * 16
            |       + (ascii(substr(h, 2, 1)) - CASE WHEN ascii(substr(h, 2, 1)) >= 97 THEN 87 ELSE 48 END)
            |       + noise AS luma
            |  FROM px0),
            |s1 AS (
            |  SELECT vid, slot, y, u, SUM(luma * c[CAST(u + 1 AS INTEGER)][CAST(x + 1 AS INTEGER)]) AS s
            |  FROM px, range(0, 8) tu(u), cb GROUP BY vid, slot, y, u),
            |s2 AS (
            |  SELECT vid, slot, u, v, SUM(s * c[CAST(v + 1 AS INTEGER)][CAST(y + 1 AS INTEGER)]) AS coef
            |  FROM s1, range(0, 8) tv(v), cb GROUP BY vid, slot, u, v),
            |tots AS (SELECT vid, slot, SUM(coef) AS tot FROM s2
            |         WHERE NOT (u = 0 AND v = 0) GROUP BY vid, slot),
            |bits AS (
            |  SELECT s2.vid, s2.slot, CAST(u * 8 + v AS INTEGER) AS idx,
            |         CASE WHEN 63 * coef > tot THEN 1 ELSE 0 END AS bit
            |  FROM s2 JOIN tots USING (vid, slot) WHERE NOT (u = 0 AND v = 0)),
            |ph AS (
            |  SELECT vid, slot, CAST(SUM(CAST(bit AS BIGINT) << (idx - 1)) AS BIGINT) AS phash
            |  FROM bits GROUP BY vid, slot),
            |bands AS (
            |  SELECT vid, slot, phash, k, (phash >> CAST(16 * k AS INTEGER)) & 65535 AS band
            |  FROM ph, range(0, 4) tk(k)),
            |cand AS (
            |  SELECT DISTINCT a.vid AS vid_a, b.vid AS vid_b
            |  FROM bands a JOIN bands b
            |    ON a.slot = b.slot AND a.k = b.k AND a.band = b.band AND a.vid < b.vid),
            |scored AS (
            |  SELECT c.vid_a, c.vid_b,
            |         CAST(SUM(bit_count(xor(pa.phash, pb.phash))) AS INTEGER) AS hamming
            |  FROM cand c
            |  JOIN ph pa ON pa.vid = c.vid_a
            |  JOIN ph pb ON pb.vid = c.vid_b AND pb.slot = pa.slot
            |  GROUP BY c.vid_a, c.vid_b)
            |SELECT vid_a, vid_b, hamming, (vid_a // 2 = vid_b // 2) AS same_base
            |FROM scored WHERE hamming <= $HammingMax
            |ORDER BY vid_a, vid_b""".stripMargin)) { (s, d) =>
    val ph = framePhashes(s)
    val bands = ph.select(col("vid"), col("slot"), col("phash"),
        explode(array((0 until 4).map(lit): _*)).as("k"))
      .withColumn("band", expr("shiftright(phash, cast(16 * k as int)) & 65535"))
    val a = bands.select(col("slot"), col("k"), col("band"), col("vid").as("vid_a"))
    val b = bands.select(col("slot"), col("k"), col("band"), col("vid").as("vid_b"))
    val cand = a.join(b, Seq("slot", "k", "band"))
      .filter(col("vid_a") < col("vid_b"))
      .select("vid_a", "vid_b").distinct()
    val pa = ph.select(col("vid").as("vid_a"), col("slot"), col("phash").as("pa"))
    val pb = ph.select(col("vid").as("vid_b"), col("slot"), col("phash").as("pb"))
    cand.join(pa, "vid_a").join(pb, Seq("vid_b", "slot"))
      .groupBy("vid_a", "vid_b")
      .agg(sum(bit_count(col("pa").bitwiseXOR(col("pb")))).cast("int").as("hamming"))
      .filter(col("hamming") <= HammingMax)
      .withColumn("same_base", expr("vid_a DIV 2 = vid_b DIV 2"))
      .select("vid_a", "vid_b", "hamming", "same_base")
      .orderBy("vid_a", "vid_b")
  }

  /** (vid, slot, phash) for the generated corpus, computed by the
    * [[graft.multimodal.Phash.hash]] JVM kernel per (vid, slot) row —
    * the AnnKernels pattern: the previous expression shape ran the
    * 32×32 DCT as two hash-agg passes over an exploded
    * videos×slots×1024×8 frame (~8M intermediate rows re-paid every
    * suite run; 19.3 s in the round-9 stamped bench, 18% of the judged
    * total), where the kernel is 1024 md5s + one integer DCT per row
    * over a FIXED 800-row (vid, slot) frame. Parity is twofold: the
    * kernel's exact integer arithmetic is order-independent, so it is
    * bit-identical to the hash-agg expression twin
    * ([[framePhashesExpr]], pinned by VideoHashSpec at reduced size)
    * and to the DuckDB oracle's SQL replay of the same fixed-point
    * basis. At corpus scale the per-row work is O(1) (a video's
    * sampled frames), so the shape stays linear in videos with no
    * shuffle before the banding join. */
  private[graft] def framePhashes(s: SparkSession): DataFrame =
    framePhashesKernel(s, Videos)

  private[graft] def framePhashesKernel(s: SparkSession, videos: Int): DataFrame = {
    import s.implicits._
    val slots = Slots
    val stride = Stride
    // range gives defaultParallelism contiguous chunks — 800 rows of
    // equal per-row cost spread evenly, no shuffle needed
    s.range(0, videos.toLong * slots).as[Long]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = "0123456789abcdef".toCharArray
        def md5hex(t: String): String = {
          md.reset()
          val d = md.digest(t.getBytes("UTF-8"))
          val sb = new java.lang.StringBuilder(32)
          var i = 0
          while (i < d.length) {
            sb.append(hex((d(i) >> 4) & 0xf)); sb.append(hex(d(i) & 0xf)); i += 1
          }
          sb.toString
        }
        def hexv(c: Char): Int = if (c >= 'a') c - 87 else c - 48
        it.map { row =>
          val vid = row / slots
          val slot = (row % slots).toInt
          val base = vid / 2
          val frame = slot * stride
          val luma = new Array[Int](Phash.N * Phash.N)
          var x = 0
          while (x < 32) {
            var y = 0
            while (y < 32) {
              val key = s"$base:$frame:$x:$y"
              val h = md5hex(key + ":vpx")
              var v = hexv(h.charAt(0)) * 16 + hexv(h.charAt(1))
              if (vid % 2 == 1 && md5hex(key + ":vn").charAt(0) == '0') v += 1
              // Phash.hash is row-major (y*N+x); the DCT's exact integer
              // sums are symmetric in traversal order so the axis naming
              // only has to match the oracle's (u over x, v over y)
              luma(y * Phash.N + x) = v
              y += 1
            }
            x += 1
          }
          (vid, slot, Phash.hash(luma))
        }
      }
      .toDF("vid", "slot", "phash")
  }

  /** Expression-shaped twin of [[framePhashesKernel]] — q70's
    * px→s1→s2→bits chain with a frame-slot dimension, the shape the
    * DuckDB oracle replays. Kept (parameterized by corpus size) as the
    * parity anchor: VideoHashSpec pins kernel == expression on a
    * reduced corpus, and exact integer arithmetic makes the equality
    * independent of aggregation order. */
  private[graft] def framePhashesExpr(s: SparkSession, videos: Int): DataFrame = {
    val cb = basisCol
    def hexv(c: Column): Column =
      ascii(c) - when(ascii(c) >= 97, 87).otherwise(48)
    val px = s.range(0, videos.toLong).select(col("id").as("vid"))
      .select(col("vid"), explode(array((0 until Slots).map(lit): _*)).as("slot"))
      .select(col("vid"), col("slot"), explode(sequence(lit(0), lit(31))).as("x"))
      .select(col("vid"), col("slot"), col("x"),
        explode(sequence(lit(0), lit(31))).as("y"))
      .withColumn("h", md5(concat_ws(":",
        expr("vid DIV 2").cast("string"), (col("slot") * Stride).cast("string"),
        col("x").cast("string"), col("y").cast("string"), lit("vpx"))))
      .withColumn("noise",
        when(col("vid") % 2 === 1 &&
          substring(md5(concat_ws(":",
            expr("vid DIV 2").cast("string"), (col("slot") * Stride).cast("string"),
            col("x").cast("string"), col("y").cast("string"), lit("vn"))), 1, 1) === "0",
          1).otherwise(0))
      .withColumn("luma",
        (hexv(substring(col("h"), 1, 1)) * 16 +
          hexv(substring(col("h"), 2, 1)) + col("noise")).cast("long"))
      .select("vid", "slot", "x", "y", "luma")
    val s1 = px
      .select(col("vid"), col("slot"), col("x"), col("y"), col("luma"),
        explode(array((0 until 8).map(lit): _*)).as("u"))
      .withColumn("t", col("luma") *
        element_at(element_at(cb, col("u") + 1), col("x").cast("int") + 1))
      .groupBy("vid", "slot", "y", "u").agg(sum(col("t")).as("s"))
    val s2 = s1
      .select(col("vid"), col("slot"), col("y"), col("u"), col("s"),
        explode(array((0 until 8).map(lit): _*)).as("v"))
      .withColumn("t", col("s") *
        element_at(element_at(cb, col("v") + 1), col("y").cast("int") + 1))
      .groupBy("vid", "slot", "u", "v").agg(sum(col("t")).as("coef"))
      .filter(!(col("u") === 0 && col("v") === 0))
    val tots = s2.groupBy("vid", "slot").agg(sum(col("coef")).as("tot"))
    s2.join(tots, Seq("vid", "slot"))
      .withColumn("idx", (col("u") * 8 + col("v")).cast("int"))
      .withColumn("bit", when(lit(63) * col("coef") > col("tot"), 1L).otherwise(0L))
      .groupBy("vid", "slot")
      .agg(sum(expr("shiftleft(bit, idx - 1)")).as("phash"))
  }

  // ---------------------------------------------------------------- Q90
  /** Video SCENE-CUT detection — the shot-boundary pass a video curation
    * pipeline runs before frame sampling (sample per shot, not per
    * fixed stride): consecutive sampled frames whose perceptual-hash
    * hamming distance exceeds a threshold mark a cut. Standard recipe
    * (pHash deltas are the classic cheap shot detector); here over a
    * generated 120-video corpus whose 4 sampled slots are two 2-slot
    * SCENES — within a scene frames differ by sparse +1 noise (hamming
    * small), across the scene boundary the luma field re-keys (hamming
    * large) — so the query must separate the two regimes, not just
    * threshold noise.
    *
    * Same scale shape as q75's hash side: per-(vid, slot) JVM kernel
    * (1024 md5s + integer DCT — [[framePhashesKernel]]'s twin with a
    * scene-keyed generator), then a slot-successor self-join keyed on
    * vid — linear in videos, no banding needed because the pairs are
    * adjacency, not similarity search. Oracle replays pixel gen, DCT,
    * and hamming bit-for-bit (exact integer arithmetic throughout). */
  private val SceneVideos = 120
  private val CutThreshold = 16

  val q90 = DeclaredQuery(
    "q90_video_scene_cuts",
    Some(s"""WITH vids AS (SELECT CAST(range AS BIGINT) AS vid FROM range(0, $SceneVideos)),
            |slots AS (SELECT CAST(range AS INTEGER) AS slot FROM range(0, $Slots)),
            |cb AS (SELECT $basisSql AS c),
            |px0 AS (
            |  SELECT vid, slot, x, y,
            |         md5(concat_ws(':', CAST(vid AS VARCHAR),
            |                            CAST(slot // 2 AS VARCHAR),
            |                            CAST(x AS VARCHAR), CAST(y AS VARCHAR), 'spx')) AS h,
            |         CASE WHEN substr(md5(concat_ws(':',
            |                CAST(vid AS VARCHAR), CAST(slot AS VARCHAR),
            |                CAST(x AS VARCHAR), CAST(y AS VARCHAR), 'sn')), 1, 1) = '0'
            |              THEN 1 ELSE 0 END AS noise
            |  FROM vids, slots, range(0, 32) tx(x), range(0, 32) ty(y)),
            |px AS (
            |  SELECT vid, slot, x, y,
            |         (ascii(substr(h, 1, 1)) - CASE WHEN ascii(substr(h, 1, 1)) >= 97 THEN 87 ELSE 48 END) * 16
            |       + (ascii(substr(h, 2, 1)) - CASE WHEN ascii(substr(h, 2, 1)) >= 97 THEN 87 ELSE 48 END)
            |       + noise AS luma
            |  FROM px0),
            |s1 AS (
            |  SELECT vid, slot, y, u, SUM(luma * c[CAST(u + 1 AS INTEGER)][CAST(x + 1 AS INTEGER)]) AS s
            |  FROM px, range(0, 8) tu(u), cb GROUP BY vid, slot, y, u),
            |s2 AS (
            |  SELECT vid, slot, u, v, SUM(s * c[CAST(v + 1 AS INTEGER)][CAST(y + 1 AS INTEGER)]) AS coef
            |  FROM s1, range(0, 8) tv(v), cb GROUP BY vid, slot, u, v),
            |tots AS (SELECT vid, slot, SUM(coef) AS tot FROM s2
            |         WHERE NOT (u = 0 AND v = 0) GROUP BY vid, slot),
            |bits AS (
            |  SELECT s2.vid, s2.slot, CAST(u * 8 + v AS INTEGER) AS idx,
            |         CASE WHEN 63 * coef > tot THEN 1 ELSE 0 END AS bit
            |  FROM s2 JOIN tots USING (vid, slot) WHERE NOT (u = 0 AND v = 0)),
            |ph AS (
            |  SELECT vid, slot, CAST(SUM(CAST(bit AS BIGINT) << (idx - 1)) AS BIGINT) AS phash
            |  FROM bits GROUP BY vid, slot)
            |SELECT a.vid, a.slot + 1 AS boundary_slot,
            |       CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming,
            |       bit_count(xor(a.phash, b.phash)) > $CutThreshold AS is_cut
            |FROM ph a JOIN ph b ON b.vid = a.vid AND b.slot = a.slot + 1
            |ORDER BY a.vid, boundary_slot""".stripMargin)) { (s, d) =>
    val ph = scenePhashes(s)
    val a = ph.select(col("vid"), col("slot"), col("phash").as("pa"))
    val b = ph.select(col("vid"), (col("slot") - 1).as("slot"), col("phash").as("pb"))
    a.join(b, Seq("vid", "slot"))
      .withColumn("hamming", bit_count(col("pa").bitwiseXOR(col("pb"))).cast("int"))
      .select(col("vid"), (col("slot") + 1).as("boundary_slot"),
        col("hamming"), (col("hamming") > CutThreshold).as("is_cut"))
      .orderBy("vid", "boundary_slot")
  }

  /** scene-keyed twin of [[framePhashesKernel]]: luma keys on
    * (vid, slot DIV 2) — the SCENE — plus per-slot sparse +1 noise, so
    * in-scene neighbors hash near and cross-scene neighbors hash far. */
  private[graft] def scenePhashes(s: SparkSession): DataFrame = {
    import s.implicits._
    val slots = Slots
    s.range(0, SceneVideos.toLong * slots).as[Long]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = "0123456789abcdef".toCharArray
        def md5hex(t: String): String = {
          md.reset()
          val d = md.digest(t.getBytes("UTF-8"))
          val sb = new java.lang.StringBuilder(32)
          var i = 0
          while (i < d.length) {
            sb.append(hex((d(i) >> 4) & 0xf)); sb.append(hex(d(i) & 0xf)); i += 1
          }
          sb.toString
        }
        def hexv(c: Char): Int = if (c >= 'a') c - 87 else c - 48
        it.map { row =>
          val vid = row / slots
          val slot = (row % slots).toInt
          val scene = slot / 2
          val luma = new Array[Int](Phash.N * Phash.N)
          var x = 0
          while (x < 32) {
            var y = 0
            while (y < 32) {
              val h = md5hex(s"$vid:$scene:$x:$y:spx")
              var v = hexv(h.charAt(0)) * 16 + hexv(h.charAt(1))
              if (md5hex(s"$vid:$slot:$x:$y:sn").charAt(0) == '0') v += 1
              luma(y * Phash.N + x) = v
              y += 1
            }
            x += 1
          }
          (vid, slot, Phash.hash(luma))
        }
      }
      .toDF("vid", "slot", "phash")
  }

  val all: Seq[DeclaredQuery] = Seq(q75, q90)
}
