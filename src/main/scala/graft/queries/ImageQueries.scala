package graft.queries

import graft.DeclaredQuery
import graft.multimodal.Phash
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual IMAGE dedup (round-8: the image-side twin of the text
  * near-dup family q27/q28/q44): 32×32 luma → integer fixed-point DCT
  * pHash ([[graft.multimodal.Phash]]) → 64-bit-class fingerprint → the
  * q44 band machinery (4×16-bit bands → bucket join → exact hamming
  * inside buckets). Total pair work is Σ(bucket²), never n².
  *
  * The declared corpus is GENERATED inside the query — md5-derived pixel
  * grids (100 base images × 2 variants, the variant adding +1 to ~1/16 of
  * pixels) — because the oracle must replay pixel generation, DCT, and
  * banding bit-for-bit in SQL; the fixed-point basis makes every step
  * exact integer arithmetic. Real image bytes take the production path
  * instead: decode via the multimodal layer → `Phash.downscale` →
  * `Phash.hash` in one scan (MultimodalSpec pins Scala/SQL hash parity on
  * this same grid construction).
  */
object ImageQueries {

  private val Imgs = 200 // 100 near-dup pairs
  private val HammingMax = 10

  private def basisSql: String =
    Phash.basis.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")

  private def basisCol: Column =
    array(Phash.basis.map(r => array(r.map(lit): _*)): _*)

  // ---------------------------------------------------------------- Q70
  val q70 = DeclaredQuery(
    "q70_image_phash_neardup",
    Some(s"""WITH imgs AS (SELECT CAST(range AS BIGINT) AS img_id FROM range(0, $Imgs)),
            |cb AS (SELECT $basisSql AS c),
            |px0 AS (
            |  SELECT img_id, x, y,
            |         md5(concat_ws(':', CAST(img_id // 2 AS VARCHAR),
            |                            CAST(x AS VARCHAR), CAST(y AS VARCHAR), 'px')) AS h,
            |         CASE WHEN img_id % 2 = 1 AND substr(md5(concat_ws(':',
            |                CAST(img_id // 2 AS VARCHAR), CAST(x AS VARCHAR),
            |                CAST(y AS VARCHAR), 'n')), 1, 1) = '0'
            |              THEN 1 ELSE 0 END AS noise
            |  FROM imgs, range(0, 32) tx(x), range(0, 32) ty(y)),
            |px AS (
            |  SELECT img_id, x, y,
            |         (ascii(substr(h, 1, 1)) - CASE WHEN ascii(substr(h, 1, 1)) >= 97 THEN 87 ELSE 48 END) * 16
            |       + (ascii(substr(h, 2, 1)) - CASE WHEN ascii(substr(h, 2, 1)) >= 97 THEN 87 ELSE 48 END)
            |       + noise AS luma
            |  FROM px0),
            |s1 AS (
            |  SELECT img_id, y, u, SUM(luma * c[CAST(u + 1 AS INTEGER)][CAST(x + 1 AS INTEGER)]) AS s
            |  FROM px, range(0, 8) tu(u), cb GROUP BY img_id, y, u),
            |s2 AS (
            |  SELECT img_id, u, v, SUM(s * c[CAST(v + 1 AS INTEGER)][CAST(y + 1 AS INTEGER)]) AS coef
            |  FROM s1, range(0, 8) tv(v), cb GROUP BY img_id, u, v),
            |tots AS (SELECT img_id, SUM(coef) AS tot FROM s2
            |         WHERE NOT (u = 0 AND v = 0) GROUP BY img_id),
            |bits AS (
            |  SELECT s2.img_id, CAST(u * 8 + v AS INTEGER) AS idx,
            |         CASE WHEN 63 * coef > tot THEN 1 ELSE 0 END AS bit
            |  FROM s2 JOIN tots USING (img_id) WHERE NOT (u = 0 AND v = 0)),
            |ph AS (
            |  SELECT img_id, CAST(SUM(CAST(bit AS BIGINT) << (idx - 1)) AS BIGINT) AS phash
            |  FROM bits GROUP BY img_id),
            |bands AS (
            |  SELECT img_id, phash, k, (phash >> CAST(16 * k AS INTEGER)) & 65535 AS band
            |  FROM ph, range(0, 4) tk(k)),
            |cand AS (
            |  SELECT DISTINCT a.img_id AS img_a, b.img_id AS img_b,
            |                  a.phash AS pa, b.phash AS pb
            |  FROM bands a JOIN bands b
            |    ON a.k = b.k AND a.band = b.band AND a.img_id < b.img_id)
            |SELECT img_a, img_b,
            |       CAST(bit_count(xor(pa, pb)) AS INTEGER) AS hamming,
            |       (img_a // 2 = img_b // 2) AS same_base
            |FROM cand WHERE bit_count(xor(pa, pb)) <= $HammingMax
            |ORDER BY img_a, img_b""".stripMargin)) { (s, d) =>
    val phash = phashes(s)
    // q44's band machinery: 4×16-bit bands → bucket join → exact hamming
    val bands = phash.select(col("img_id"), col("phash"),
        explode(array((0 until 4).map(lit): _*)).as("k"))
      .withColumn("band", expr("shiftright(phash, cast(16 * k as int)) & 65535"))
    val a = bands.select(col("k"), col("band"), col("img_id").as("img_a"), col("phash").as("pa"))
    val b = bands.select(col("k"), col("band"), col("img_id").as("img_b"), col("phash").as("pb"))
    a.join(b, Seq("k", "band"))
      .filter(col("img_a") < col("img_b"))
      .select("img_a", "img_b", "pa", "pb").distinct()
      .withColumn("hamming", bit_count(col("pa").bitwiseXOR(col("pb"))).cast("int"))
      .filter(col("hamming") <= HammingMax)
      .withColumn("same_base", expr("img_a DIV 2 = img_b DIV 2"))
      .select("img_a", "img_b", "hamming", "same_base")
      .orderBy("img_a", "img_b")
  }

  /** (img_id, phash) for the generated corpus, computed by the
    * [[graft.multimodal.Phash.hash]] JVM kernel per img_id row — the
    * q75 recipe applied to q70 (round-11 verdict item 1): the previous
    * expression shape ran the 32×32 DCT as two shuffled hash-agg passes
    * over an exploded imgs×1024×8 frame (~1.6M intermediate rows
    * re-paid every suite run; 7.8 s in the round-10 stamped bench vs
    * 0.84 s quiet-box), where the kernel is 1024 md5s + one integer DCT
    * per row over a FIXED 200-row img frame. Parity is twofold: the
    * kernel's exact integer arithmetic is order-independent, so it is
    * bit-identical to the hash-agg expression twin ([[phashesExpr]],
    * pinned by PhashSpec at reduced size) and to the DuckDB oracle's
    * SQL replay of the same fixed-point basis. At corpus scale the
    * per-row work is O(1) per image, so the shape stays linear in
    * images with no shuffle before the banding join. */
  private[graft] def phashes(s: SparkSession): DataFrame =
    phashesKernel(s, Imgs)

  private[graft] def phashesKernel(s: SparkSession, imgs: Int): DataFrame = {
    import s.implicits._
    s.range(0, imgs.toLong).as[Long]
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
        it.map { imgId =>
          val base = imgId / 2
          val luma = new Array[Int](Phash.N * Phash.N)
          var x = 0
          while (x < 32) {
            var y = 0
            while (y < 32) {
              val key = s"$base:$x:$y"
              val h = md5hex(key + ":px")
              var v = hexv(h.charAt(0)) * 16 + hexv(h.charAt(1))
              if (imgId % 2 == 1 && md5hex(key + ":n").charAt(0) == '0') v += 1
              // Phash.hash is row-major (y*N+x); the DCT's exact integer
              // sums match the oracle's axis naming (u over x, v over y)
              luma(y * Phash.N + x) = v
              y += 1
            }
            x += 1
          }
          (imgId, Phash.hash(luma))
        }
      }
      .toDF("img_id", "phash")
  }

  /** Expression-shaped twin of [[phashesKernel]] — the px→s1→s2→bits
    * hash-agg chain the DuckDB oracle replays. Kept (parameterized by
    * corpus size) as the parity anchor: PhashSpec pins kernel ==
    * expression on a reduced corpus, and exact integer arithmetic makes
    * the equality independent of aggregation order. */
  private[graft] def phashesExpr(s: SparkSession, imgs: Int): DataFrame = {
    val cb = basisCol
    def hexv(c: Column): Column =
      ascii(c) - when(ascii(c) >= 97, 87).otherwise(48)
    val px = s.range(0, imgs.toLong).select(col("id").as("img_id"))
      .select(col("img_id"),
        explode(sequence(lit(0), lit(31))).as("x"))
      .select(col("img_id"), col("x"),
        explode(sequence(lit(0), lit(31))).as("y"))
      .withColumn("h", md5(concat_ws(":",
        expr("img_id DIV 2").cast("string"), col("x").cast("string"),
        col("y").cast("string"), lit("px"))))
      .withColumn("noise",
        when(col("img_id") % 2 === 1 &&
          substring(md5(concat_ws(":",
            expr("img_id DIV 2").cast("string"), col("x").cast("string"),
            col("y").cast("string"), lit("n"))), 1, 1) === "0", 1).otherwise(0))
      .withColumn("luma",
        (hexv(substring(col("h"), 1, 1)) * 16 +
          hexv(substring(col("h"), 2, 1)) + col("noise")).cast("long"))
      .select("img_id", "x", "y", "luma")
    val s1 = px
      .select(col("img_id"), col("x"), col("y"), col("luma"),
        explode(array((0 until 8).map(lit): _*)).as("u"))
      .withColumn("t", col("luma") *
        element_at(element_at(cb, col("u") + 1), col("x").cast("int") + 1))
      .groupBy("img_id", "y", "u").agg(sum(col("t")).as("s"))
    val s2 = s1
      .select(col("img_id"), col("y"), col("u"), col("s"),
        explode(array((0 until 8).map(lit): _*)).as("v"))
      .withColumn("t", col("s") *
        element_at(element_at(cb, col("v") + 1), col("y").cast("int") + 1))
      .groupBy("img_id", "u", "v").agg(sum(col("t")).as("coef"))
      .filter(!(col("u") === 0 && col("v") === 0))
    val tots = s2.groupBy("img_id").agg(sum(col("coef")).as("tot"))
    s2.join(tots, "img_id")
      .withColumn("idx", (col("u") * 8 + col("v")).cast("int"))
      .withColumn("bit", when(lit(63) * col("coef") > col("tot"), 1L).otherwise(0L))
      .groupBy("img_id")
      .agg(sum(expr("shiftleft(bit, idx - 1)")).as("phash"))
  }

  val all: Seq[DeclaredQuery] = Seq(q70)
}
