package graft.queries

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Q76 — extended PII scrubbing (round-9: q73 covers email+phone; this
  * adds the other three classes a pre-training redaction pass needs):
  *
  *   - IPv4 addresses, STRICT octet validation in the pattern itself
  *     (25[0-5]|2[0-4][0-9]|… — alternatives ordered longest-first so
  *     Java's leftmost-first backtracking and RE2's leftmost-longest
  *     automaton pick identical spans);
  *   - SSN-shaped ids (3-2-4 digit groups — distinct from q73's 3-3-4
  *     phones);
  *   - credit-card candidates (16 digits) gated by a LUHN CHECKSUM
  *     computed as a pure integer EXPRESSION (16 fixed substr/ascii
  *     terms with the double-and-subtract-9 fold) — no UDF, stays in
  *     whole-stage codegen, and DuckDB replays the identical arithmetic.
  *
  * The synthetic corpus carries no PII, so the query INJECTS ground
  * truth per class deterministically: every 4th doc an IPv4 (octets mod
  * 256 — always valid), every 7th an SSN, every 6th a 16-digit card
  * whose check digit is CORRECT only when doc_id % 12 == 0 (the other
  * half get check+5 mod 10) — so the Luhn gate provably discriminates:
  * valid cards scrub to [CC], invalid candidates are left in place,
  * and both engines agree on the cleaned text's hash.
  *
  * Scale shape: one per-row projection scan (regex + integer
  * arithmetic), no shuffle before the declared ORDER BY. The declared
  * corpus plants ≤1 card per doc, so the conditional scrub is a single
  * replace of the extracted candidate; a corpus with several candidates
  * per doc explodes candidates and reassembles — same expressions,
  * one extra aggregation.
  */
object PiiQueries {

  // strict IPv4 octet, longest alternative first (parity: see header)
  private val Octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9][0-9]|[0-9])"
  private val IpPat = s"$Octet[.]$Octet[.]$Octet[.]$Octet"
  private val SsnPat = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
  private val CcPat = "[0-9]{16}"

  /** Luhn partial sum: digits 1..nDigits of `s`, each doubled (with −9
    * above 9) when its position from the right OF THE FULL totalLen-digit
    * CARD (totalLen+1−i) is even — the standard card checksum. The
    * injection side sums the 15-digit base with totalLen=16 (digit i of
    * the base keeps position i in the final card; the check digit is
    * APPENDED at position 16, from-right 1, never doubled), so
    * chk = (10 − sum15 % 10) % 10 makes the full card validate. */
  private def luhnSumCol(s: Column, nDigits: Int, totalLen: Int): Column =
    (1 to nDigits).map { i =>
      val d = ascii(substring(s, i, 1)) - 48
      if ((totalLen + 1 - i) % 2 == 0) {
        val t = d * 2
        when(t > 9, t - 9).otherwise(t)
      } else d
    }.reduce(_ + _)

  private def luhnSumSql(expr: String, nDigits: Int, totalLen: Int): String =
    (1 to nDigits).map { i =>
      val d = s"(ascii(substr($expr, $i, 1)) - 48)"
      if ((totalLen + 1 - i) % 2 == 0)
        s"(CASE WHEN $d * 2 > 9 THEN $d * 2 - 9 ELSE $d * 2 END)"
      else d
    }.mkString("(", " + ", ")")

  val q76 = DeclaredQuery(
    "q76_pii_extended",
    Some(s"""WITH inj0 AS (
            |  SELECT doc_id, text,
            |         lpad(CAST((doc_id * 9973) % 1000000000000000 AS VARCHAR), 15, '0') AS cc15
            |  FROM documents),
            |inj1 AS (
            |  SELECT doc_id, text, cc15,
            |         CAST((10 - ${luhnSumSql("cc15", 15, 16)} % 10) % 10 AS BIGINT) AS chk
            |  FROM inj0),
            |inj AS (
            |  SELECT doc_id,
            |         text
            |         || CASE WHEN doc_id % 4 = 0
            |                 THEN ' ip ' || CAST((doc_id * 3) % 256 AS VARCHAR)
            |                      || '.' || CAST((doc_id * 5) % 256 AS VARCHAR)
            |                      || '.' || CAST((doc_id * 11) % 256 AS VARCHAR)
            |                      || '.' || CAST((doc_id * 17) % 256 AS VARCHAR)
            |                 ELSE '' END
            |         || CASE WHEN doc_id % 7 = 0
            |                 THEN ' ssn ' || lpad(CAST((doc_id * 19) % 1000 AS VARCHAR), 3, '0')
            |                      || '-' || lpad(CAST((doc_id * 23) % 100 AS VARCHAR), 2, '0')
            |                      || '-' || lpad(CAST((doc_id * 29) % 10000 AS VARCHAR), 4, '0')
            |                 ELSE '' END
            |         || CASE WHEN doc_id % 6 = 0
            |                 THEN ' card ' || cc15 ||
            |                      CAST(CASE WHEN doc_id % 12 = 0 THEN chk ELSE (chk + 5) % 10 END AS VARCHAR)
            |                 ELSE '' END AS t
            |  FROM inj1),
            |scrub AS (
            |  SELECT doc_id, t,
            |         CAST(len(regexp_extract_all(t, '$IpPat')) AS INTEGER) AS n_ips,
            |         CAST(len(regexp_extract_all(t, '$SsnPat')) AS INTEGER) AS n_ssns,
            |         regexp_extract(t, '$CcPat') AS cc
            |  FROM inj),
            |luhn AS (
            |  SELECT doc_id, t, n_ips, n_ssns,
            |         CASE WHEN cc <> '' THEN 1 ELSE 0 END AS cc_candidate,
            |         CASE WHEN cc <> '' AND ${luhnSumSql("cc", 16, 16)} % 10 = 0
            |              THEN 1 ELSE 0 END AS cc_valid,
            |         cc
            |  FROM scrub)
            |SELECT doc_id, n_ips, n_ssns, cc_candidate, cc_valid,
            |       md5(CASE WHEN cc_valid = 1 THEN replace(base, cc, '[CC]') ELSE base END) AS clean_hash
            |FROM (SELECT *, regexp_replace(regexp_replace(t,
            |        '$IpPat', '[IP]', 'g'), '$SsnPat', '[SSN]', 'g') AS base FROM luhn)
            |ORDER BY doc_id""".stripMargin)) { (s, d) =>
    val cc15 = lpad(((col("doc_id") * 9973) % 1000000000000000L).cast("string"), 15, "0")
    val chk = (lit(10) - luhnSumCol(col("cc15"), 15, 16) % 10) % 10
    val t = concat(col("text"),
      when(col("doc_id") % 4 === 0,
        concat(lit(" ip "), ((col("doc_id") * 3) % 256).cast("string"),
          lit("."), ((col("doc_id") * 5) % 256).cast("string"),
          lit("."), ((col("doc_id") * 11) % 256).cast("string"),
          lit("."), ((col("doc_id") * 17) % 256).cast("string"))).otherwise(""),
      when(col("doc_id") % 7 === 0,
        concat(lit(" ssn "),
          lpad(((col("doc_id") * 19) % 1000).cast("string"), 3, "0"), lit("-"),
          lpad(((col("doc_id") * 23) % 100).cast("string"), 2, "0"), lit("-"),
          lpad(((col("doc_id") * 29) % 10000).cast("string"), 4, "0"))).otherwise(""),
      when(col("doc_id") % 6 === 0,
        concat(lit(" card "), col("cc15"),
          when(col("doc_id") % 12 === 0, col("chk"))
            .otherwise((col("chk") + 5) % 10).cast("string"))).otherwise(""))
    val withT = Tables.documents(s, d)
      .withColumn("cc15", cc15)
      .withColumn("chk", chk)
      .select(col("doc_id"), t.as("t"))
    val scrub = withT.select(col("doc_id"), col("t"),
      size(regexp_extract_all(col("t"), lit(IpPat), lit(0))).cast("int").as("n_ips"),
      size(regexp_extract_all(col("t"), lit(SsnPat), lit(0))).cast("int").as("n_ssns"),
      regexp_extract(col("t"), CcPat, 0).as("cc"))
    scrub
      .withColumn("cc_candidate", when(col("cc") =!= "", 1).otherwise(0))
      .withColumn("cc_valid",
        when(col("cc") =!= "" && luhnSumCol(col("cc"), 16, 16) % 10 === 0, 1).otherwise(0))
      .withColumn("base", regexp_replace(regexp_replace(col("t"),
        IpPat, "[IP]"), SsnPat, "[SSN]"))
      .select(col("doc_id"), col("n_ips"), col("n_ssns"),
        col("cc_candidate"), col("cc_valid"),
        md5(when(col("cc_valid") === 1,
          expr("replace(base, cc, '[CC]')")).otherwise(col("base"))).as("clean_hash"))
      .orderBy("doc_id")
  }

  val all: Seq[DeclaredQuery] = Seq(q76)
}
