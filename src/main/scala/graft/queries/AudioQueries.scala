package graft.queries

import graft.DeclaredQuery
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual AUDIO dedup (round-8, the q70 pattern on the audio axis):
  * integer amplitude-envelope fingerprint ([[graft.multimodal.AudioHash]])
  * → 4×16-bit band bucketing → exact hamming pairs. As with q70, the
  * declared corpus is GENERATED in-query (md5-derived PCM, 100 base clips
  * × 2 variants with ±-free +1 noise on ~1/16 of samples) so the DuckDB
  * oracle replays sample synthesis, energy cells, bits, and banding as
  * exact integer arithmetic. Real WAV bytes take the production path:
  * decodeAudio → int quantize → AudioHash.hash in one scan
  * (AudioHashSpec pins Scala/SQL parity and the WAV round-trip).
  */
object AudioQueries {

  private val Clips = 200 // 100 near-dup pairs
  private val Samples = 2304 // 9 windows × 8 cells × 32 samples
  private val HammingMax = 10

  // ---------------------------------------------------------------- Q71
  val q71 = DeclaredQuery(
    "q71_audio_envelope_neardup",
    Some(s"""WITH clips AS (SELECT CAST(range AS BIGINT) AS clip_id FROM range(0, $Clips)),
            |sm0 AS (
            |  SELECT clip_id, j,
            |         md5(concat_ws(':', CAST(clip_id // 2 AS VARCHAR),
            |                            CAST(j AS VARCHAR), 'au')) AS h,
            |         CASE WHEN clip_id % 2 = 1 AND substr(md5(concat_ws(':',
            |                CAST(clip_id // 2 AS VARCHAR), CAST(j AS VARCHAR),
            |                'an')), 1, 1) = '0'
            |              THEN 1 ELSE 0 END AS noise
            |  FROM clips, range(0, $Samples) tj(j)),
            |sm AS (
            |  SELECT clip_id, j,
            |         (ascii(substr(h, 1, 1)) - CASE WHEN ascii(substr(h, 1, 1)) >= 97 THEN 87 ELSE 48 END) * 16
            |       + (ascii(substr(h, 2, 1)) - CASE WHEN ascii(substr(h, 2, 1)) >= 97 THEN 87 ELSE 48 END)
            |       - 128 + noise AS s
            |  FROM sm0),
            |e AS (
            |  SELECT clip_id, CAST(j // 256 AS INTEGER) AS w,
            |         CAST((j % 256) // 32 AS INTEGER) AS b, SUM(abs(s)) AS en
            |  FROM sm GROUP BY clip_id, w, b),
            |bits AS (
            |  SELECT a.clip_id, CAST(a.w * 7 + a.b AS INTEGER) AS idx,
            |         CASE WHEN a.en > c.en THEN 1 ELSE 0 END AS bit
            |  FROM e a JOIN e c ON a.clip_id = c.clip_id AND a.w = c.w AND c.b = a.b + 1),
            |ah AS (
            |  SELECT clip_id, CAST(SUM(CAST(bit AS BIGINT) << idx) AS BIGINT) AS ahash
            |  FROM bits GROUP BY clip_id),
            |bands AS (
            |  SELECT clip_id, ahash, k, (ahash >> CAST(16 * k AS INTEGER)) & 65535 AS band
            |  FROM ah, range(0, 4) tk(k)),
            |cand AS (
            |  SELECT DISTINCT a.clip_id AS clip_a, b.clip_id AS clip_b,
            |                  a.ahash AS ha, b.ahash AS hb
            |  FROM bands a JOIN bands b
            |    ON a.k = b.k AND a.band = b.band AND a.clip_id < b.clip_id)
            |SELECT clip_a, clip_b,
            |       CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming,
            |       (clip_a // 2 = clip_b // 2) AS same_base
            |FROM cand WHERE bit_count(xor(ha, hb)) <= $HammingMax
            |ORDER BY clip_a, clip_b""".stripMargin)) { (s, d) =>
    val ah = ahashes(s)
    val bands = ah.select(col("clip_id"), col("ahash"),
        explode(array((0 until 4).map(lit): _*)).as("k"))
      .withColumn("band", expr("shiftright(ahash, cast(16 * k as int)) & 65535"))
    val a = bands.select(col("k"), col("band"), col("clip_id").as("clip_a"), col("ahash").as("ha"))
    val b = bands.select(col("k"), col("band"), col("clip_id").as("clip_b"), col("ahash").as("hb"))
    a.join(b, Seq("k", "band"))
      .filter(col("clip_a") < col("clip_b"))
      .select("clip_a", "clip_b", "ha", "hb").distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int"))
      .filter(col("hamming") <= HammingMax)
      .withColumn("same_base", expr("clip_a DIV 2 = clip_b DIV 2"))
      .select("clip_a", "clip_b", "hamming", "same_base")
      .orderBy("clip_a", "clip_b")
  }

  /** (clip_id, ahash) for the generated corpus, computed by the
    * [[graft.multimodal.AudioHash.hash]] JVM kernel per clip_id row —
    * the q75 recipe applied to q71 (round-11 verdict item 1): the
    * previous expression shape synthesized clips×2304 sample rows and
    * ran the envelope as a shuffled hash-agg + neighbor join (8.4 s in
    * the round-10 stamped bench vs 0.78 s quiet-box), where the kernel
    * is 2304 md5s + one integer envelope per row over a FIXED 200-row
    * clip frame. Parity: exact integer arithmetic is order-independent,
    * so the kernel is bit-identical to the hash-agg expression twin
    * ([[ahashesExpr]], pinned by AudioHashSpec at reduced size) and to
    * the DuckDB oracle's SQL replay. Linear in clips, no shuffle before
    * the banding join. */
  private[graft] def ahashes(s: SparkSession): DataFrame =
    ahashesKernel(s, Clips)

  private[graft] def ahashesKernel(s: SparkSession, clips: Int): DataFrame = {
    import s.implicits._
    val samples = Samples
    s.range(0, clips.toLong).as[Long]
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
        it.map { clipId =>
          val base = clipId / 2
          val pcm = new Array[Int](samples)
          var j = 0
          while (j < samples) {
            val h = md5hex(s"$base:$j:au")
            var v = hexv(h.charAt(0)) * 16 + hexv(h.charAt(1)) - 128
            if (clipId % 2 == 1 && md5hex(s"$base:$j:an").charAt(0) == '0') v += 1
            pcm(j) = v
            j += 1
          }
          (clipId, graft.multimodal.AudioHash.hash(pcm))
        }
      }
      .toDF("clip_id", "ahash")
  }

  /** Expression-shaped twin of [[ahashesKernel]] — the sm→e→bits→ah
    * hash-agg chain the DuckDB oracle replays. Kept (parameterized by
    * corpus size) as the parity anchor: AudioHashSpec pins kernel ==
    * expression on a reduced corpus; exact integer arithmetic makes the
    * equality independent of aggregation order. */
  private[graft] def ahashesExpr(s: SparkSession, clips: Int): DataFrame = {
    def hexv(c: Column): Column =
      ascii(c) - when(ascii(c) >= 97, 87).otherwise(48)
    val sm = s.range(0, clips.toLong).select(col("id").as("clip_id"))
      .select(col("clip_id"), explode(sequence(lit(0), lit(Samples - 1))).as("j"))
      .withColumn("h", md5(concat_ws(":",
        expr("clip_id DIV 2").cast("string"), col("j").cast("string"), lit("au"))))
      .withColumn("noise",
        when(col("clip_id") % 2 === 1 &&
          substring(md5(concat_ws(":",
            expr("clip_id DIV 2").cast("string"), col("j").cast("string"),
            lit("an"))), 1, 1) === "0", 1).otherwise(0))
      .withColumn("s",
        (hexv(substring(col("h"), 1, 1)) * 16 +
          hexv(substring(col("h"), 2, 1)) - 128 + col("noise")).cast("long"))
      .select("clip_id", "j", "s")
    val e = sm
      .withColumn("w", expr("j DIV 256").cast("int"))
      .withColumn("b", expr("(j % 256) DIV 32").cast("int"))
      .groupBy("clip_id", "w", "b").agg(sum(abs(col("s"))).as("en"))
    val neigh = e.select(col("clip_id"), col("w"),
      (col("b") - 1).as("b"), col("en").as("en_next"))
    e.join(neigh, Seq("clip_id", "w", "b"))
      .withColumn("idx", (col("w") * 7 + col("b")).cast("int"))
      .withColumn("bit", when(col("en") > col("en_next"), 1L).otherwise(0L))
      .groupBy("clip_id")
      .agg(sum(expr("shiftleft(bit, idx)")).as("ahash"))
  }

  val all: Seq[DeclaredQuery] = Seq(q71)
}
