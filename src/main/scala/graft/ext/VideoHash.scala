package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Perceptual VIDEO near-duplication — the last modality of the
  * content-dedup matrix (text q21/q48, image q127/q128/q133, audio
  * q134/q135): synthesize a real multi-frame video container per
  * document, demux it frame by frame through an independent decoder,
  * frame-sample, hash every sampled frame with the [[ImageHash]] dHash,
  * and find near-identical videos by a banded temporal Hamming join.
  *
  * The container is an animated GIF89a ([[MediaCodecs.encodeGif]] —
  * our own LZW entropy coder on the write path, the JDK ImageIO GIF
  * plugin's independent LZW on the read path), the one published video
  * format whose frames are pure integer arithmetic end to end, so
  * every pixel survives the round trip bit-exactly and the DuckDB
  * oracle can replay frame synthesis, sampling, and the per-frame
  * gradient hash from `documents.text` hex bytes (the q110 recipe).
  *
  * Frame sampling is the real thing the q72-era stub stood in for: the
  * frame COUNT comes out of the decoded container, not a metadata
  * column, and only every [[SampleEvery]]-th frame is hashed — the
  * standard cost lever of video dedup pipelines (a 30 fps corpus is
  * hashed at 1-2 fps in practice; publicly described in e.g. the
  * video-retrieval literature on keyframe fingerprinting).
  *
  * Scale: synthesis+demux+hash is ONE narrow mapPartitions pass — no
  * payload byte ever crosses a shuffle (the q110/q127 posture). The
  * near-dup join ships (video_id, frame_idx, two longs) rows banded on
  * 16-bit band values ([[BucketCap]]-bounded), and the verify join is
  * keyed on candidate pair ids — the q128 shape with a frame_idx
  * equality added. */
object VideoHash {

  /** Per-frame source offset: frame f of a document reads its pixels
    * from the text bytes rotated by f*17 — consecutive frames are the
    * same content shifted, like consecutive keyframes of a pan. */
  val FrameShift = 17

  /** Hash every 2nd frame (frame_idx 0, 2, 4). */
  val SampleEvery = 2

  /** Planted-twin id offset (shared with the image family). */
  val PerturbId: Long = ImageHash.PerturbId

  /** Per-common-frame Hamming budget of the near-dup gate. */
  val MaxHammingPerFrame: Int = ImageHash.DefaultMaxHamming

  /** Deterministically synthesize the document's video: F = 2 + len%4
    * frames of the q110 raster geometry (w = 8 + len%9, h = 6 + len%7,
    * 1 channel), frame f's pixel p = src[(p + f*[[FrameShift]]) % len],
    * encoded as an animated GIF. Every frame is at least 8x6 — never
    * below the [[ImageHash]] 8x4 grid. */
  def synthesizeVideo(id: Long, text: Array[Byte]): Array[Byte] = {
    val src = if (text.isEmpty) Array[Byte](42) else text
    val len = src.length
    val w = 8 + len % 9
    val h = 6 + len % 7
    val nf = 2 + len % 4
    val frames = (0 until nf).map { f =>
      val px = new Array[Byte](w * h)
      var p = 0
      while (p < px.length) {
        px(p) = src((p + f * FrameShift) % len)
        p += 1
      }
      px
    }
    MediaCodecs.encodeGif(w, h, frames)
  }

  /** Every document's synthesized video payload (no mod-6 arm split —
    * the video corpus is its own modality, parallel to the media one). */
  def videoPayloads(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, text) =>
        (id, synthesizeVideo(id, text))
      })
      .toDF("doc_id", "payload")
  }

  /** One demux+decode pass over the session's video corpus,
    * materialized once: per FRAME, the exact pixel sum/count (q136's
    * sufficient statistics) and — on sampled frames — the dHash pair
    * (q137's fingerprint). The two registered consumers are different
    * projections of the same decode, and a 100 TB pipeline decodes a
    * video exactly once and derives every per-frame feature in that
    * pass — re-running the LZW decoder per query was registration
    * overhead. ~40 B/frame, corpus-frame-count-sized; results
    * identical with or without the memo (both oracles replay the codec
    * from `documents.text` independently). */
  private[graft] def frameProductsFor(spark: SparkSession,
      dir: String): DataFrame =
    graft.SessionMemo(spark, s"video-frame-products:$dir") {
      import spark.implicits._
      videoPayloads(spark, dir)
        .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, p) =>
          MediaCodecs.decodeGifFrames(p).toSeq.flatMap { g =>
            // a parseable GIF with zero image descriptors still gets a
            // sentinel row (frame_idx −1, zero sums, no hash) so q136
            // reports the zero-frame video instead of silently losing
            // the doc; q137's null-hash filter excludes it
            if (g.frames.isEmpty)
              Seq((id, -1, 0, g.width, g.height, 0L, 0L,
                Option.empty[Long], Option.empty[Long]))
            else g.frames.indices.map { f =>
              val fr = g.frames(f)
              var s = 0L
              var i = 0
              while (i < fr.length) { s += fr(i) & 0xff; i += 1 }
              val hash =
                if (f % SampleEvery == 0)
                  ImageHash.dhashOne(MediaCodecs.ImagePixels("gif",
                    g.width, g.height, 1, fr))
                else None
              (id, f, g.frames.length, g.width, g.height, s,
                fr.length.toLong, hash.map(_._1), hash.map(_._2))
            }
          }
        })
        .toDF("doc_id", "frame_idx", "n_frames", "width", "height",
          "f_px_sum", "f_n_px", "dhash_h", "dhash_v")
        .localCheckpoint()
    }

  /** q136: per-video frame statistics straight off the DECODED
    * container — frame count from the demuxer (not metadata), geometry,
    * and the integer pixel sum over every frame. The codec gate: one
    * wrong LZW code width, sub-block split, or palette entry anywhere
    * in the round trip flips px_sum. ORDER BY = oracle determinism
    * only. */
  def videoFrameStats(spark: SparkSession, dir: String): DataFrame =
    frameProductsFor(spark, dir)
      .groupBy(col("doc_id"))
      .agg(max(col("n_frames")).cast("int").as("n_frames"),
        max(col("width")).cast("int").as("width"),
        max(col("height")).cast("int").as("height"),
        sum(col("f_px_sum")).as("px_sum"),
        sum(col("f_n_px")).as("n_px"))
      .orderBy(col("doc_id"))

  /** Frame-sampled per-frame dHash over any (doc_id, payload) video
    * frame — one narrow demux+hash pass. */
  def fingerprintsOf(payloads: DataFrame): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        MediaCodecs.decodeGifFrames(p).toSeq.flatMap { g =>
          (0 until g.frames.length by SampleEvery).flatMap { f =>
            ImageHash.dhashOne(
                MediaCodecs.ImagePixels("gif", g.width, g.height, 1,
                  g.frames(f)))
              .map { case (hh, vv) => (id, f, g.frames.length, hh, vv) }
          }
        }
      })
      .toDF("doc_id", "frame_idx", "n_frames", "dhash_h", "dhash_v")
  }

  /** q137: the sampled-frame fingerprint of the whole corpus — the
    * per-video temporal signature that feeds the near-dup join. ORDER
    * BY = oracle determinism only. */
  def videoFingerprint(spark: SparkSession, dir: String): DataFrame =
    sampledFingerprintsOf(frameProductsFor(spark, dir))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** The sampled-frame fingerprint projection of a frame-product
    * frame — ONE definition of "which frames carry the signature"
    * shared by q137's output and q138's base side, so the sampling
    * predicate cannot silently diverge between them. Sort-free. */
  private def sampledFingerprintsOf(products: DataFrame): DataFrame =
    products
      .filter(col("frame_idx") % SampleEvery === 0 &&
        col("dhash_h").isNotNull)
      .select(col("doc_id"), col("frame_idx"), col("n_frames"),
        col("dhash_h"), col("dhash_v"))

  /** Temporal near-dup pairs over any fingerprint frame: candidates
    * share a 16-bit band of one sampled frame's hash AT THE SAME
    * frame_idx (the image banding with time alignment added); verified
    * pairs must keep total Hamming within [[MaxHammingPerFrame]] per
    * common sampled frame. Returns (a, b, n_common, total_hamming). */
  def videoNearDupPairsOf(fp: DataFrame,
      maxPerFrame: Int = MaxHammingPerFrame,
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val banded = BucketCap.capBuckets(
      fp.select(col("doc_id"), col("frame_idx"), posexplode(
          array(
            col("dhash_h").bitwiseAND(0xffffL),
            shiftrightunsigned(col("dhash_h"), 16).bitwiseAND(0xffffL),
            col("dhash_v").bitwiseAND(0xffffL),
            shiftrightunsigned(col("dhash_v"), 16).bitwiseAND(0xffffL))))
        .toDF("doc_id", "frame_idx", "band_idx", "band_val"),
      Seq("frame_idx", "band_idx", "band_val"), maxBucket, "video-bands")
    val cand = banded.as("x").join(banded.as("y"),
        col("x.frame_idx") === col("y.frame_idx") &&
          col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val fa = fp.select(col("doc_id").as("a"), col("frame_idx"),
      col("dhash_h").as("ha"), col("dhash_v").as("va"))
    val fb = fp.select(col("doc_id").as("b"), col("frame_idx"),
      col("dhash_h").as("hb"), col("dhash_v").as("vb"))
    cand.join(fa, "a").join(fb, Seq("b", "frame_idx"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).cast("int").as("n_common"),
        sum(bit_count(col("ha").bitwiseXOR(col("hb"))) +
          bit_count(col("va").bitwiseXOR(col("vb")))).as("total_hamming"))
      .filter(col("total_hamming") <= col("n_common") * maxPerFrame)
  }

  /** q138: near-dup pairs over the planted-twin video corpus — every
    * twin must surface as (doc_id, doc_id + 10^6) with per-frame
    * Hamming within budget on ALL common sampled frames; naturally
    * similar videos may add pairs, which the oracle reproduces by
    * replaying the identical algorithm. Fingerprints are checkpointed
    * once: the pair derivation reads them four times (band self-join +
    * both verify sides), and ~24 B/sampled frame is vastly cheaper to
    * materialize than to demux the video corpus again — the posture a
    * 100 TB pipeline would take (hash once, join the hashes). The
    * perturbed corpus's fingerprints COMPOSE: base videos come from
    * the session's decode-once frame products (the q137 rows), only
    * the planted twins (10% of docs) are synthesized and demuxed
    * here — fingerprintsOf is a row-wise narrow map, so mapping a
    * union is the union of the maps, and the incremental posture
    * (hash only what's new) is exactly how a twin batch would land
    * at 100 TB. ORDER BY = oracle determinism only. */
  def videoNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = sampledFingerprintsOf(frameProductsFor(spark, dir))
    // the q128 twin recipe on videos: for doc_id % 10 = 0, a planted
    // near-identical twin (id + PerturbId) re-synthesized from
    // ImageHash.perturb'ed source bytes — same length, so same
    // geometry and frame count, sparsely bumped pixels in every frame
    val twins = fingerprintsOf(
      Tables(spark, dir, "documents")
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("text").cast("binary").as("bytes"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, text) =>
          val src = if (text.isEmpty) Array[Byte](42) else text
          (id + PerturbId, synthesizeVideo(id, ImageHash.perturb(src)))
        })
        .toDF("doc_id", "payload"))
    videoNearDupPairsOf(base.unionByName(twins).localCheckpoint(eager = false))
      .orderBy(col("a"), col("b"))
  }

  // -------------------------------------------------------- oracles

  /** Shared oracle scaffold: frame pixels replayed from the text hex
    * bytes (v = src[(p + f*17) % len], with the pert bump), the 8x4
    * cell partition, and both packed gradient words per SAMPLED frame.
    * `idsCte` must yield (vid_id, doc_id, pert). */
  private def frameDhashCte(idsCte: String): String = {
    val gw = ImageHash.GridW
    val gh = ImageHash.GridH
    val ps = ImageHash.PerturbStride
    s"""d AS (SELECT i.vid_id, i.pert, t.doc_id,
         CASE WHEN octet_length(encode(t.text)) = 0 THEN '2A'
              ELSE hex(encode(t.text)) END AS hx,
         CASE WHEN octet_length(encode(t.text)) = 0 THEN 1
              ELSE octet_length(encode(t.text)) END AS len
       FROM ($idsCte) i JOIN documents t ON t.doc_id = i.doc_id),
       geo AS (SELECT vid_id, pert, hx, len,
           8 + len % 9 AS w, 6 + len % 7 AS h, 2 + len % 4 AS nf
         FROM d),
       fr AS (SELECT vid_id, pert, hx, len, w, h, nf,
           unnest(range(0, nf)) AS f
         FROM geo),
       sfr AS (SELECT * FROM fr WHERE f % $SampleEvery = 0),
       px AS (SELECT vid_id, pert, hx, len, w, h, nf, f,
           unnest(range(0, w * h)) AS p
         FROM sfr),
       cell AS (SELECT vid_id, nf, f, w, h,
           ((p // w) * $gh // h) AS gy, ((p % w) * $gw // w) AS gx,
           (CAST(('0x' || substr(hx,
              (((p + f * $FrameShift) % len) * 2) + 1, 2))::INTEGER
             AS BIGINT)
            + CASE WHEN pert = 1
                AND ((p + f * $FrameShift) % len) % $ps = 0
                THEN 1 ELSE 0 END) % 256 AS v
         FROM px),
       cs AS (SELECT vid_id, nf, f, gy, gx,
                CAST(sum(v) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS c
              FROM cell GROUP BY ALL),
       bits AS (SELECT a.vid_id, a.nf, a.f,
           CASE WHEN a.s * r.c < r.s * a.c
             THEN (CAST(1 AS BIGINT) << CAST(a.gy * $gw + a.gx AS INT))
             ELSE 0 END AS hbit,
           CASE WHEN a.s * dn.c < dn.s * a.c
             THEN (CAST(1 AS BIGINT) << CAST(a.gy * $gw + a.gx AS INT))
             ELSE 0 END AS vbit
         FROM cs a
           JOIN cs r ON r.vid_id = a.vid_id AND r.f = a.f AND r.gy = a.gy
             AND r.gx = (a.gx + 1) % $gw
           JOIN cs dn ON dn.vid_id = a.vid_id AND dn.f = a.f
             AND dn.gx = a.gx AND dn.gy = (a.gy + 1) % $gh),
       hsh AS (SELECT vid_id, nf, f,
                 CAST(sum(hbit) AS BIGINT) AS dhash_h,
                 CAST(sum(vbit) AS BIGINT) AS dhash_v
               FROM bits GROUP BY ALL)"""
  }

  /** Oracle for q136 [[videoFrameStats]]: geometry, frame count, and
    * the full-corpus pixel sum re-derived from the text bytes — the
    * whole container round trip must be bit-exact for the hash to
    * match. */
  val videoFrameStatsOracle: String =
    s"""WITH d AS (SELECT doc_id,
         CASE WHEN octet_length(encode(text)) = 0 THEN '2A'
              ELSE hex(encode(text)) END AS hx,
         CASE WHEN octet_length(encode(text)) = 0 THEN 1
              ELSE octet_length(encode(text)) END AS len
       FROM documents),
       geo AS (SELECT doc_id, hx, len,
           8 + len % 9 AS w, 6 + len % 7 AS h, 2 + len % 4 AS nf
         FROM d),
       px AS (SELECT doc_id, hx, len, w, h, nf,
           unnest(range(0, nf * w * h)) AS i
         FROM geo),
       b AS (SELECT doc_id, w, h, nf,
           CAST(('0x' || substr(hx,
              ((((i % (w * h)) + (i // (w * h)) * $FrameShift) % len) * 2)
                + 1, 2))::INTEGER AS BIGINT) AS v
         FROM px)
       SELECT doc_id, CAST(nf AS INT) AS n_frames, CAST(w AS INT) AS width,
         CAST(h AS INT) AS height, CAST(sum(v) AS BIGINT) AS px_sum,
         CAST(count(*) AS BIGINT) AS n_px
       FROM b GROUP BY doc_id, nf, w, h ORDER BY doc_id"""

  /** Oracle for q137 [[videoFingerprint]]: every sampled frame's packed
    * gradient words recomputed from the text bytes — a wrong frame
    * shift, sample stride, or cell boundary flips bits. */
  val videoFingerprintOracle: String =
    s"""WITH ${frameDhashCte(
      "SELECT doc_id AS vid_id, doc_id, 0 AS pert FROM documents")}
       SELECT vid_id AS doc_id, CAST(f AS INT) AS frame_idx,
         CAST(nf AS INT) AS n_frames, dhash_h, dhash_v
       FROM hsh ORDER BY doc_id, frame_idx"""

  /** Oracle for q138 [[videoNearDup]]: fingerprints for the base corpus
    * AND the planted twins, the identical time-aligned 16-bit banding,
    * candidate join, and the per-common-frame Hamming budget. */
  val videoNearDupOracle: String =
    s"""WITH ${frameDhashCte(
      "SELECT doc_id AS vid_id, doc_id, 0 AS pert FROM documents " +
        s"UNION ALL SELECT doc_id + $PerturbId, doc_id, 1 FROM documents " +
        "WHERE doc_id % 10 = 0")},
       bnum AS (SELECT unnest(range(0, 4)) AS bi),
       band AS (SELECT vid_id, f, bi,
           CASE bi WHEN 0 THEN dhash_h & 65535
                   WHEN 1 THEN (dhash_h >> 16) & 65535
                   WHEN 2 THEN dhash_v & 65535
                   ELSE (dhash_v >> 16) & 65535 END AS bv
         FROM hsh CROSS JOIN bnum),
       cand AS (SELECT DISTINCT x.vid_id AS a, y.vid_id AS b
                FROM band x JOIN band y
                  ON x.f = y.f AND x.bi = y.bi AND x.bv = y.bv
                    AND x.vid_id < y.vid_id),
       vf AS (SELECT cand.a, cand.b,
                CAST(count(*) AS INT) AS n_common,
                CAST(sum(bit_count(xor(ha.dhash_h, hb.dhash_h))
                  + bit_count(xor(ha.dhash_v, hb.dhash_v))) AS BIGINT)
                  AS total_hamming
              FROM cand
                JOIN hsh ha ON ha.vid_id = cand.a
                JOIN hsh hb ON hb.vid_id = cand.b AND hb.f = ha.f
              GROUP BY cand.a, cand.b)
       SELECT a, b, n_common, total_hamming FROM vf
       WHERE total_hamming <= n_common * $MaxHammingPerFrame
       ORDER BY a, b"""
}
