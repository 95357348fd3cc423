package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Perceptual audio near-duplication — the audio-side twin of
  * [[ImageHash]], completing content-level dedup across every corpus
  * modality: fingerprint each decoded clip with an integer-exact
  * energy-delta hash, then find near-identical clips by banded Hamming
  * join. The published family is spectral-band energy-difference
  * fingerprinting (Haitsma & Kalker 2002, "A Highly Robust Audio
  * Fingerprinting System"); this variant trades the FFT for TIME-domain
  * frame energies so every step is exact integer arithmetic a DuckDB
  * oracle can replay from the document bytes (the q109 recipe):
  *
  *   - decode to 16-bit PCM; s16 = round(s·2^15) recovers the stored
  *     integer exactly (the q109 rule);
  *   - cut the clip into 32 frames (frame f = samples with
  *     i·32/n = f, integer division); frame ENERGY = Σ|s16|;
  *   - 32 gradient bits: bit f is 1 iff frame f's mean |s16| is below
  *     frame (f+1 mod 32)'s, compared by integer cross-multiplication
  *     (frames can differ by one sample in length — no division).
  *
  * Clips shorter than the frame grid (< 32 samples) are skipped — no
  * stable fingerprint exists. Pairs: 4 bands of 8 bits; any pair within
  * Hamming distance ≤ 3 shares a band by pigeonhole; the reported set
  * is "band-collision candidates within ≤ maxHamming", deterministic on
  * both engines, BucketCap-guarded, never all-pairs.
  *
  * Scale: fingerprinting is a narrow mapPartitions decode (payload
  * bytes never shuffle); the pair join ships (doc_id, one long) per
  * band row on 8-bit band keys.
  */
object AudioHash {

  /** Frames per clip → fingerprint bits. */
  val FrameCount = 32

  /** Default Hamming radius for the registered pair query. */
  val DefaultMaxHamming = 4

  /** Energy-delta fingerprint of one decoded clip, or None for clips
    * shorter than the frame grid. */
  def fingerprintOne(samples: Array[Double]): Option[Long] = {
    val n = samples.length
    if (n < FrameCount) return None
    val sums = new Array[Long](FrameCount)
    val cnts = new Array[Long](FrameCount)
    var i = 0
    while (i < n) {
      val f = (i.toLong * FrameCount / n).toInt
      sums(f) += math.abs(math.round(samples(i) * 32768.0))
      cnts(f) += 1
      i += 1
    }
    var fp = 0L
    var f = 0
    while (f < FrameCount) {
      val g = (f + 1) % FrameCount
      if (sums(f) * cnts(g) < sums(g) * cnts(f)) fp |= 1L << f
      f += 1
    }
    Some(fp)
  }

  /** Fingerprints over any (doc_id, payload) frame — narrow
    * mapPartitions decode of every WAV payload. */
  def fingerprintsOf(payloads: DataFrame): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        MediaCodecs.decodeWav(p).flatMap { a =>
          fingerprintOne(a.samples).map(fp =>
            (id, a.samples.length.toLong, fp))
        }
      })
      .toDF("doc_id", "n_samples", "fp")
  }

  /** q134: fingerprint the synthesized WAV corpus. ORDER BY = oracle
    * determinism only. */
  def audioFingerprint(spark: SparkSession, dir: String): DataFrame =
    fingerprintsOf(Multimodal.mediaPayloads(spark, dir))
      .orderBy(col("doc_id"))

  /** Banded Hamming pairs over any (doc_id, fp) frame — 4 bands of 8
    * bits, BucketCap guard, bit_count(xor) verification. */
  def audioNearDupPairsOf(fps: DataFrame,
      maxHamming: Int = DefaultMaxHamming,
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val banded = BucketCap.capBuckets(
      fps.select(col("doc_id"), col("fp"), posexplode(array(
        (0 until 4).map(b =>
          shiftrightunsigned(col("fp"), b * 8).bitwiseAND(0xffL)): _*)))
        .toDF("doc_id", "fp", "band_idx", "band_val"),
      Seq("band_idx", "band_val"), maxBucket, "audiofp-bands")
    banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        bit_count(col("x.fp").bitwiseXOR(col("y.fp"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** q135's corpus: every WAV document's clip, plus — for each
    * doc_id % 30 = 15 (the WAV ids are ≡ 3 mod 6, so % 10 alone never
    * fires) — a PLANTED near-identical twin (id + [[ImageHash.PerturbId]]):
    * the same clip re-synthesized from [[ImageHash.perturb]]ed source
    * bytes, i.e. sparse single-step sample noise. */
  def perturbedPayloads(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, text) =>
        if (math.floorMod(id, 6L) != 3) Iterator.empty
        else {
          val base = Iterator((id, Multimodal.synthesizeMedia(id, text)))
          if (id % 30 == 15) {
            val src = if (text.isEmpty) Array[Byte](42) else text
            base ++ Iterator((id + ImageHash.PerturbId,
              Multimodal.synthesizeMedia(id, ImageHash.perturb(src))))
          } else base
        }
      })
      .toDF("doc_id", "payload")
  }

  /** q135: banded Hamming pairs over the perturbed-twin WAV corpus —
    * every planted twin must surface with a small distance. ORDER BY =
    * oracle determinism only. */
  def audioNearDup(spark: SparkSession, dir: String): DataFrame =
    audioNearDupPairsOf(fingerprintsOf(perturbedPayloads(spark, dir)))
      .orderBy(col("a"), col("b"))

  /** Shared oracle scaffold: s16 sample replay from document bytes (the
    * q109 recipe, perturbation-aware), 32 frame energies, the packed
    * gradient word. `idsCte` must yield (img_id, doc_id, pert). */
  private def fpCte(idsCte: String): String =
    s"""wavdocs AS (SELECT i.img_id, i.pert, t.doc_id,
         CASE WHEN octet_length(encode(t.text)) = 0 THEN '2A'
              ELSE hex(encode(t.text)) END AS hx,
         CASE WHEN octet_length(encode(t.text)) = 0 THEN 1
              ELSE octet_length(encode(t.text)) END AS len
       FROM ($idsCte) i JOIN documents t ON t.doc_id = i.doc_id),
       par AS (SELECT img_id, pert, hx, len, least(2048, len * 4) AS n
               FROM wavdocs
               WHERE least(2048, len * 4) >= $FrameCount),
       pos AS (SELECT img_id, pert, hx, len, n, unnest(range(0, n)) AS i
               FROM par),
       smp AS (SELECT img_id, n, i,
           CAST(floor(((CAST(('0x' || substr(hx, ((i % len) * 2) + 1, 2))
                 ::INTEGER AS BIGINT)
               + CASE WHEN pert = 1 AND (i % len) % ${ImageHash.PerturbStride}
                   = 0 THEN 1 ELSE 0 END) % 256 - 128)
             * 32767 / 128.0 + 0.5) AS BIGINT) AS s
         FROM pos),
       en AS (SELECT img_id, n, (i * $FrameCount) // n AS f,
                CAST(sum(abs(s)) AS BIGINT) AS e,
                CAST(count(*) AS BIGINT) AS c
              FROM smp GROUP BY ALL),
       fps AS (SELECT a.img_id, any_value(a.n) AS n,
                 CAST(sum(CASE WHEN a.e * b.c < b.e * a.c
                   THEN (CAST(1 AS BIGINT) << CAST(a.f AS INT))
                   ELSE 0 END) AS BIGINT) AS fp
               FROM en a JOIN en b ON b.img_id = a.img_id
                 AND b.f = (a.f + 1) % $FrameCount
               GROUP BY a.img_id)"""

  /** Oracle for q134 [[audioFingerprint]]. */
  val audioFingerprintOracle: String =
    s"""WITH ${fpCte(
      "SELECT doc_id AS img_id, doc_id, 0 AS pert FROM documents " +
        "WHERE doc_id % 6 = 3")}
       SELECT img_id AS doc_id, n AS n_samples, fp
       FROM fps ORDER BY doc_id"""

  /** Oracle for q135 [[audioNearDup]]: fingerprints for the base corpus
    * and the planted twins, then the identical 4×8-bit banding and
    * Hamming gate. */
  val audioNearDupOracle: String =
    s"""WITH ${fpCte(
      "SELECT doc_id AS img_id, doc_id, 0 AS pert FROM documents " +
        "WHERE doc_id % 6 = 3 UNION ALL " +
        s"SELECT doc_id + ${ImageHash.PerturbId}, doc_id, 1 FROM documents " +
        "WHERE doc_id % 30 = 15")},
       bnum AS (SELECT unnest(range(0, 4)) AS bi),
       band AS (SELECT img_id, fp, bi, (fp >> CAST(bi * 8 AS INT)) & 255 AS bv
                FROM fps CROSS JOIN bnum),
       cand AS (SELECT DISTINCT x.img_id AS a, y.img_id AS b,
                  x.fp AS fa, y.fp AS fb
                FROM band x JOIN band y
                  ON x.bi = y.bi AND x.bv = y.bv AND x.img_id < y.img_id)
       SELECT a, b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
       FROM cand WHERE bit_count(xor(fa, fb)) <= $DefaultMaxHamming
       ORDER BY a, b"""
}
