package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Luhn.{luhn_check_digit, luhn_valid}

/** Checksum-validated PII detection and redaction — the upgrade over
  * q56's pattern-only scrub that production pipelines apply before
  * releasing training data (cf. the BigCode/StarCoder PII pass):
  * phone numbers match on structure, but card-shaped digit runs are
  * REDACTED ONLY when their Luhn mod-10 checksum validates
  * ([[graft.functions.Luhn]]) — a pattern-only pass either leaks real
  * cards (too strict a pattern) or destroys order ids and timestamps
  * (too loose). Candidates that fail the checksum are counted and left
  * in place.
  *
  * Scale: pure narrow map — regex extraction, a higher-order filter
  * through the codegen'd validator, and a fold of literal replacements
  * for the validated matches; zero shuffle at any corpus size.
  *
  * The driver corpus carries no PII, so the registered q125 plants
  * deterministic fixtures first ([[synthesizePiiOf]]): every doc_id %
  * 5 = 0 gains a phone, every doc_id % 3 = 0 a 16-digit card whose
  * check digit is CORRECT only when doc_id % 2 = 0 — so the oracle
  * proves the operator both redacts valid cards and refuses invalid
  * ones. The DuckDB oracle replays the synthesis and the Luhn sum
  * analytically (the q119 state-machine-replay idiom).
  */
object Pii {

  private val PhoneRe = "\\([0-9]{3}\\) [0-9]{3}-[0-9]{4}"
  private val CardRe = "[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}"

  /** Deterministic PII planting over any (doc_id, text) DataFrame. */
  def synthesizePiiOf(docs: DataFrame): DataFrame = {
    val base15 = format_string("4%014d", col("doc_id") * 371 + 123)
    val check = luhn_check_digit(base15)
    val digit = when(col("doc_id") % 2 === 0, check)
      .otherwise((check + 1) % 10)
    val card16 = concat(base15, digit.cast("string"))
    val cardFmt = concat_ws("-",
      substring(card16, 1, 4), substring(card16, 5, 4),
      substring(card16, 9, 4), substring(card16, 13, 4))
    val phone = format_string("(%03d) 555-%04d",
      col("doc_id") % 700 + 200, col("doc_id") % 10000)
    docs.select(col("doc_id"), concat(col("text"),
      when(col("doc_id") % 5 === 0, concat(lit(" contact "), phone))
        .otherwise(lit("")),
      when(col("doc_id") % 3 === 0, concat(lit(" card "), cardFmt))
        .otherwise(lit(""))).as("text"))
  }

  /** Scan + redact over any (doc_id, text) DataFrame — the general,
    * sort-free operator: phone matches redact to `<PHONE>`; card-shaped
    * candidates redact to `<CARD>` iff Luhn-valid, otherwise stay and
    * are reported as rejected candidates. */
  def piiScanOf(d: DataFrame): DataFrame = {
    val bound = d.select(col("doc_id"), col("text"),
      regexp_extract_all(col("text"), lit(PhoneRe), lit(0)).as("phones"),
      regexp_extract_all(col("text"), lit(CardRe), lit(0)).as("cands"))
      .withColumn("valid_cards", filter(col("cands"), c => luhn_valid(c)))
    bound.select(col("doc_id"),
      size(col("phones")).cast("long").as("n_phones"),
      size(col("cands")).cast("long").as("n_card_candidates"),
      size(col("valid_cards")).cast("long").as("n_cards_valid"),
      aggregate(col("valid_cards"),
        regexp_replace(col("text"), PhoneRe, "<PHONE>"),
        (acc, c) => replace(acc, c, lit("<CARD>"))).as("text_redacted"))
  }

  /** q125: plant + scan over the documents table. ORDER BY = oracle
    * determinism only. */
  def piiScan(spark: SparkSession, dir: String): DataFrame =
    piiScanOf(synthesizePiiOf(
        Tables(spark, dir, "documents").select(col("doc_id"), col("text"))))
      .orderBy(col("doc_id"))

  /** Oracle: synthesis formulas and the Luhn sum replayed analytically —
    * base15 digits summed right-to-left with odd positions doubled
    * (matching [[graft.functions.Luhn.sum]] at shift 1), check digit
    * derived, validity = doc_id even, redaction assembled from the
    * same trailers the synthesis appends. */
  val piiOracle: String =
    """WITH base AS (SELECT doc_id, text,
           doc_id % 5 = 0 AS has_phone,
           doc_id % 3 = 0 AS has_card,
           '4' || lpad(CAST(doc_id * 371 + 123 AS VARCHAR), 14, '0') AS b15
         FROM documents),
       lu AS (SELECT doc_id,
                sum(CASE WHEN i % 2 = 1
                    THEN CASE WHEN 2 * d > 9 THEN 2 * d - 9 ELSE 2 * d END
                    ELSE d END) AS s
              FROM (SELECT doc_id, i,
                      CAST(substring(reverse(b15), i, 1) AS INT) AS d
                    FROM base, unnest(generate_series(1, 15)) AS t(i))
              GROUP BY doc_id),
       card AS (SELECT base.doc_id,
                  b15 || CAST(CASE WHEN base.doc_id % 2 = 0
                      THEN (10 - s % 10) % 10
                      ELSE CAST(((10 - s % 10) % 10 + 1) % 10 AS BIGINT)
                    END AS VARCHAR) AS c16,
                  base.doc_id % 2 = 0 AS valid
                FROM base JOIN lu ON lu.doc_id = base.doc_id)
       SELECT b.doc_id,
         CAST(CASE WHEN has_phone THEN 1 ELSE 0 END AS BIGINT) AS n_phones,
         CAST(CASE WHEN has_card THEN 1 ELSE 0 END AS BIGINT)
           AS n_card_candidates,
         CAST(CASE WHEN has_card AND valid THEN 1 ELSE 0 END AS BIGINT)
           AS n_cards_valid,
         b.text
           || CASE WHEN has_phone THEN ' contact <PHONE>' ELSE '' END
           || CASE WHEN has_card THEN ' card ' ||
                CASE WHEN valid THEN '<CARD>'
                     ELSE substring(c16, 1, 4) || '-' ||
                          substring(c16, 5, 4) || '-' ||
                          substring(c16, 9, 4) || '-' ||
                          substring(c16, 13, 4) END
              ELSE '' END AS text_redacted
       FROM base b JOIN card ON card.doc_id = b.doc_id
       ORDER BY b.doc_id"""
}
