package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.DetLn

/** Secrets / credential scanning — the code-corpus release gate (the
  * BigCode/StarCoder PII pass, truffleHog-style detectors) that
  * complements q125's Luhn-validated card scan: emails, IPv4 addresses,
  * and key-shaped tokens. Like q125, every detector VALIDATES before it
  * redacts — pattern-only scrubbing either leaks (too strict) or
  * destroys version strings and identifiers (too loose):
  *
  *   - emails match structurally and redact to `<EMAIL>`;
  *   - IPv4 candidates match a structural dotted-quad pattern, VALIDATE
  *     only when every octet ≤ 255, and redact only PUBLIC addresses —
  *     RFC 1918 ranges (10/8, 172.16/12, 192.168/16) and loopback
  *     (127/8) are counted but left in place (they identify no one and
  *     carry signal in code corpora);
  *   - key-shaped tokens (≥ 20 chars of the base64ish charset) are
  *     REDACTED ONLY when their character-level Shannon entropy clears
  *     2.5 nats — the truffleHog gate that separates real credentials
  *     (near-uniform char draws) from padding/separator runs. Entropy
  *     is computed in [[graft.functions.DetLn]]'s exact integer
  *     micro-nat arithmetic (the q126 idiom), so the gate is replayed
  *     bit-for-bit by the DuckDB oracle rather than straddling libm.
  *
  * Scale: the email/IP path is a pure narrow map (regex extraction,
  * array filters over cast octets — all codegen'd, zero shuffle). Only
  * key candidates leave the row: they explode to (doc, candidate,
  * char) counts — candidates are RARE by construction of the charset/
  * length pattern, so the two aggregates and the doc-keyed join back
  * carry a sliver of the corpus. Sort-free but for the registered
  * query's output ORDER BY.
  */
object Secrets {

  private[graft] val EmailRe =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val IpRe =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private[graft] val KeyRe = "[A-Za-z0-9+/=_-]{20,}"

  /** Entropy gate in micro-nats per character (2.5 nats ≈ 3.6 bits). */
  val EntropyGateMicro = 2500000L

  private def octets(c: Column): Column =
    transform(split(c, "\\."), o => o.cast("int"))

  private def isPrivate(c: Column): Column = {
    val o = octets(c)
    val o1 = element_at(o, 1)
    val o2 = element_at(o, 2)
    o1 === 10 || o1 === 127 || (o1 === 192 && o2 === 168) ||
      (o1 === 172 && o2 >= 16 && o2 <= 31)
  }

  /** Scan + redact over any (doc_id, text) DataFrame. Candidate counts
    * are occurrence counts; `n_keys_flagged` counts DISTINCT flagged
    * candidates (duplicate occurrences of one credential are one
    * credential — and every occurrence is redacted regardless). */
  def secretsScanOf(d: DataFrame): DataFrame = {
    val base = d.select(col("doc_id"), col("text"),
        regexp_extract_all(col("text"), lit(EmailRe), lit(0)).as("emails"),
        regexp_extract_all(col("text"), lit(IpRe), lit(0)).as("ip_cands"),
        regexp_extract_all(col("text"), lit(KeyRe), lit(0)).as("key_cands"))
      .withColumn("ip_valid",
        filter(col("ip_cands"), c => array_max(octets(c)) <= 255))
      .withColumn("ip_public", filter(col("ip_valid"), c => !isPrivate(c)))

    // key entropy: (doc, candidate, char) counts -> exact micro-nat
    // Shannon entropy -> gate (the q126 integer pipeline, per candidate)
    val chars = base
      .select(col("doc_id"),
        explode(array_distinct(col("key_cands"))).as("cand"))
      .select(col("doc_id"), col("cand"),
        explode(split(col("cand"), "")).as("ch"))
      .groupBy(col("doc_id"), col("cand"), col("ch"))
      .agg(count(lit(1)).as("c"))
    val perCand = DetLn.withLnFix(chars, "ln_c", "c")
      .withColumn("clm", expr(DetLn.microSql("ln_c")))
      .groupBy(col("doc_id"), col("cand"))
      .agg(sum(col("c")).as("n_chars"),
        sum(col("c") * col("clm")).as("s_micro"))
    val verdicts = DetLn.withLnFix(perCand, "ln_n", "n_chars")
      .withColumn("h_scaled",
        expr(DetLn.microSql("ln_n")) * col("n_chars") - col("s_micro"))
      .withColumn("flagged",
        col("h_scaled") >= lit(EntropyGateMicro) * col("n_chars"))
    val perDoc = verdicts.groupBy(col("doc_id"))
      .agg(
        sort_array(collect_list(when(col("flagged"), col("cand"))))
          .as("flagged_keys"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_keys_flagged"))

    val joined = base.join(perDoc, Seq("doc_id"), "left")
    val r0 = regexp_replace(col("text"), EmailRe, "<EMAIL>")
    val r1 = aggregate(col("ip_public"), r0,
      (acc, c) => replace(acc, c, lit("<IP>")))
    val r2 = aggregate(
      coalesce(col("flagged_keys"), array().cast("array<string>")), r1,
      (acc, k) => replace(acc, k, lit("<KEY>")))
    joined.select(col("doc_id"),
      size(col("emails")).cast("long").as("n_emails"),
      size(col("ip_cands")).cast("long").as("n_ip_candidates"),
      size(col("ip_valid")).cast("long").as("n_ip_valid"),
      size(col("ip_public")).cast("long").as("n_ip_public"),
      size(col("key_cands")).cast("long").as("n_key_candidates"),
      coalesce(col("n_keys_flagged"), lit(0L)).as("n_keys_flagged"),
      r2.as("text_redacted"))
  }

  private val B36 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"

  /** Deterministic secrets planting over any (doc_id, text) DataFrame
    * (the corpus carries none — the q125 idiom). Every doc_id % 4 = 0
    * gains an email; % 5 = 2 an IPv4 whose third octet is the INVALID
    * 300 when doc_id % 4 = 3 and whose first octet is private-range 10
    * when doc_id % 3 = 0; % 5 = 1 an AKIA-prefixed 20-char key whose
    * 16-char tail is 16 DISTINCT alphabet positions (high entropy) for
    * even ids and one repeated character (low entropy) for odd — so the
    * oracle proves redact-valid AND refuse-invalid for every detector. */
  def synthesizeSecretsOf(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val email = concat(lit(" mail user"), id, lit("@site"), id % 7,
      lit(".net"))
    val o1 = when(id % 3 === 0, lit(10)).otherwise(lit(52))
    val o3 = when(id % 4 === 3, lit(300)).otherwise(id % 100)
    val ip = concat(lit(" ip "), o1, lit("."), id % 200 + 1, lit("."),
      o3, lit("."), id % 250)
    // gcd(11, 36) = 1, so 16 consecutive steps of +11 mod 36 are 16
    // distinct alphabet positions
    val hiKey = concat((0 until 16).map(i => expr(
      s"substring('$B36', CAST((doc_id + ${11 * i}) % 36 AS INT) + 1, 1)"))
      : _*)
    val loKey = expr(
      s"repeat(substring('$B36', CAST(doc_id % 36 AS INT) + 1, 1), 16)")
    val key = concat(lit(" key AKIA"),
      when(id % 2 === 0, hiKey).otherwise(loKey))
    docs.select(id, concat(col("text"),
      when(id % 4 === 0, email).otherwise(lit("")),
      when(id % 5 === 2, ip).otherwise(lit("")),
      when(id % 5 === 1, key).otherwise(lit(""))).as("text"))
  }

  /** q156: plant + scan over the documents table. ORDER BY = oracle
    * determinism only. */
  def secretsScan(spark: SparkSession, dir: String): DataFrame =
    secretsScanOf(synthesizeSecretsOf(
        graft.Tables.spreadScan(spark, dir, "documents")
          .select(col("doc_id"), col("text"))))
      .orderBy(col("doc_id"))

  /** Oracle: synthesis replayed string-for-string; the entropy gate
    * replayed through the identical DetLn stages over the key's
    * (char, count) rows; IP validity/privacy from the octet arithmetic. */
  lazy val secretsOracle: String = {
    val (s1, f1) = DetLn.oracleLnStages("kcnt", "e1",
      Seq("doc_id", "c"), Seq("ln_c" -> "c"))
    val (s2, f2) = DetLn.oracleLnStages("ksum", "e2",
      Seq("doc_id", "n_chars", "s_micro"), Seq("ln_n" -> "n_chars"))
    s"""WITH hi AS (SELECT doc_id,
           string_agg(substring('$B36',
             CAST((doc_id + 11 * i) % 36 AS INT) + 1, 1), ''
             ORDER BY i) AS tail
         FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 1),
           unnest(generate_series(0, 15)) AS t(i)
         GROUP BY doc_id),
       k AS (SELECT doc_id, 'AKIA' || CASE WHEN doc_id % 2 = 0 THEN tail
             ELSE repeat(substring('$B36',
               CAST(doc_id % 36 AS INT) + 1, 1), 16) END AS key
         FROM hi),
       kch AS (SELECT doc_id, substring(key, i, 1) AS ch
         FROM k, unnest(generate_series(1, 20)) AS t(i)),
       kcnt AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
         FROM kch GROUP BY 1, 2)$s1,
       ksc AS (SELECT doc_id, c, ${DetLn.microSql("ln_c")} AS clm
         FROM $f1),
       ksum AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
           CAST(sum(c * clm) AS BIGINT) AS s_micro
         FROM ksc GROUP BY 1)$s2,
       kf AS (SELECT doc_id,
           (${DetLn.microSql("ln_n")} * n_chars - s_micro)
             >= $EntropyGateMicro * n_chars AS flagged
         FROM $f2),
       d AS (SELECT doc_id, text,
           doc_id % 4 = 0 AS has_email,
           doc_id % 5 = 2 AS has_ip,
           doc_id % 5 = 1 AS has_key,
           CASE WHEN doc_id % 3 = 0 THEN 10 ELSE 52 END AS o1,
           doc_id % 200 + 1 AS o2,
           CASE WHEN doc_id % 4 = 3 THEN 300 ELSE doc_id % 100 END AS o3,
           doc_id % 250 AS o4,
           doc_id % 4 <> 3 AS ip_ok,
           doc_id % 4 <> 3 AND doc_id % 3 <> 0 AS ip_pub
         FROM documents)
       SELECT d.doc_id,
         CAST(CASE WHEN has_email THEN 1 ELSE 0 END AS BIGINT) AS n_emails,
         CAST(CASE WHEN has_ip THEN 1 ELSE 0 END AS BIGINT)
           AS n_ip_candidates,
         CAST(CASE WHEN has_ip AND ip_ok THEN 1 ELSE 0 END AS BIGINT)
           AS n_ip_valid,
         CAST(CASE WHEN has_ip AND ip_pub THEN 1 ELSE 0 END AS BIGINT)
           AS n_ip_public,
         CAST(CASE WHEN has_key THEN 1 ELSE 0 END AS BIGINT)
           AS n_key_candidates,
         CAST(CASE WHEN has_key AND kf.flagged THEN 1 ELSE 0 END AS BIGINT)
           AS n_keys_flagged,
         d.text
           || CASE WHEN has_email THEN ' mail <EMAIL>' ELSE '' END
           || CASE WHEN has_ip THEN ' ip ' ||
                CASE WHEN ip_pub THEN '<IP>'
                     ELSE o1 || '.' || o2 || '.' || o3 || '.' || o4 END
              ELSE '' END
           || CASE WHEN has_key THEN ' key ' ||
                CASE WHEN kf.flagged THEN '<KEY>' ELSE k.key END
              ELSE '' END AS text_redacted
       FROM d
       LEFT JOIN k ON k.doc_id = d.doc_id
       LEFT JOIN kf ON kf.doc_id = d.doc_id
       ORDER BY d.doc_id"""
  }
}
