package graft.ext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** WARC (Web ARChive, ISO 28500 / WARC 1.0-1.1) ingestion — the raw
  * front of CommonCrawl-shaped pipelines, upstream of everything the
  * crawl stack already does (URL curation q129/q130, robots q139,
  * extraction q123, links q124): parse archive blobs into typed records,
  * gate on HTTP fetch status, and strip response records down to their
  * payload the way the WET "conversion" derivation does.
  *
  * Format essentials implemented here (from the published standard):
  *   - a record = version line (`WARC/1.0` or `WARC/1.1`), named-field
  *     header lines, an empty line, then EXACTLY `Content-Length` octets
  *     of block, then two line breaks. Framing is length-based, NEVER
  *     boundary-scanning — a block containing the bytes `WARC/1.0` must
  *     not split a record (golden-tested);
  *   - header names are case-insensitive; values may continue onto
  *     following lines that start with space/tab (obsolete but legal);
  *   - records with `Content-Type: application/http` carry an HTTP
  *     message as the block: status line, headers, empty line, payload;
  *   - `.warc.gz` files are per-record gzip members concatenated;
  *     `GZIPInputStream` inflates member-concatenated streams whole.
  *
  * Line breaks: the standard mandates CRLF; real crawls contain LF-only
  * writers, so the parser accepts both (and the writer emits CRLF).
  *
  * Malformed framing (bad version line, missing Content-Length, block
  * running past end of input) cannot be resynchronized safely under
  * length-based framing — scanning forward for the next `WARC/` magic
  * could land inside a block. The parser therefore emits ONE quarantine
  * row (`error` set, the house CSV posture, Clean.scala:109) for the
  * failed record and stops consuming that blob; records already parsed
  * stand.
  *
  * Scale: [[readWarcDir]] reads via Spark's `binaryFile` source — one
  * task per file, the CommonCrawl execution model (archives ship as
  * ~1 GiB `.warc.gz` segments, so a 100 TB crawl is ~100k files and
  * parallelism is file count, not `maxPartitionBytes`, which cannot
  * split gzip anyway). [[recordsOf]] is a narrow `mapPartitions`
  * flatMap: no shuffle between bytes and typed records. [[wetBlobsOf]]
  * groups CONSECUTIVE records of one blob inside each partition —
  * record streams arrive blob-contiguous from the parser — so the
  * WARC→WET derivation is also shuffle-free.
  */
object Warc {

  /** One parsed record. `http_*` fields are populated only for
    * `application/http` response blocks; `body` is the block with the
    * HTTP envelope stripped and the payload DECODED per its
    * `Content-Encoding` (or the raw block when there is no envelope).
    * `http_wire_len` is the payload's transmitted octet count BEFORE
    * decode — `wire/decoded` is the transfer-compression signal.
    * `error` is null on well-formed records (quarantine idiom); a
    * payload this parser cannot decode sets `error` on the ONE record
    * (body left raw) and parsing continues — framing is intact, unlike
    * the quarantine classes that stop the blob. */
  case class WarcRecord(
      blob_id: Long,
      rec_idx: Int,
      warc_type: Option[String],
      record_id: Option[String],
      target_uri: Option[String],
      warc_date: Option[String],
      content_type: Option[String],
      content_length: Long,
      http_status: Option[Int],
      http_content_type: Option[String],
      http_location: Option[String],
      http_content_encoding: Option[String],
      http_wire_len: Option[Long],
      body: Array[Byte],
      error: Option[String])

  // ---------------------------------------------------------------- bytes

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Deflate `b` as one gzip member (JDK only — no codec deps). */
  def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  /** Per-blob inflated-size cap: a hostile or corrupt archive (a "zip
    * bomb" — tiny wire bytes inflating without bound) must cost ONE
    * quarantine row, not an executor OOM. 1.5 GiB ≈ 1.5× CommonCrawl's
    * ~1 GiB-segment convention and sits UNDER the JVM's ~2 GiB byte-
    * array bound — a larger cap could never fire, the buffer would
    * OOM first; [[parseBlob]] turns the breach into the blob's
    * quarantine row. */
  val MaxInflatedBytes: Long = 3L << 29

  private final class InflatedTooLarge(val limit: Long)
    extends RuntimeException(s"inflated size exceeds $limit bytes")

  /** Inflate a whole (possibly member-concatenated) gzip stream,
    * refusing past `limit` inflated bytes. */
  def gunzip(b: Array[Byte],
      limit: Long = MaxInflatedBytes): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(b))
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) {
      if (out.size().toLong + n > limit) throw new InflatedTooLarge(limit)
      out.write(buf, 0, n); n = in.read(buf)
    }
    out.toByteArray
  }

  /** Inflate a DEFLATE stream: zlib-wrapped (RFC 1950, `raw = false`)
    * or raw (RFC 1951, `raw = true` — the broken-server variant of
    * `Content-Encoding: deflate` that real crawls contain). Same
    * inflated-size cap as [[gunzip]] (deflate's ~1032:1 max ratio
    * makes a 2 MB record a 2 GiB bomb otherwise), and a preset-
    * dictionary stream (FDICT) is refused rather than looped on —
    * `inflate()` returns 0 with `needsInput` FALSE in that state, so
    * a truncation-only check would spin forever on one hostile
    * record. */
  private[graft] def inflate(b: Array[Byte], raw: Boolean,
      limit: Long = MaxInflatedBytes): Array[Byte] = {
    val inf = new java.util.zip.Inflater(raw)
    inf.setInput(b)
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) {
          val why =
            if (inf.needsDictionary()) "preset dictionary required"
            else if (inf.needsInput()) "truncated stream"
            else "stalled inflate"
          throw new java.util.zip.DataFormatException(why)
        }
        if (out.size().toLong + n > limit) throw new InflatedTooLarge(limit)
        out.write(buf, 0, n)
      }
    } finally inf.end()
    out.toByteArray
  }

  /** One FINAL stored DEFLATE block (RFC 1951 §3.2.4): `01`, LEN little-
    * endian, ~LEN, raw bytes — byte-deterministic by construction (no
    * dependence on any zlib build's block-splitting heuristics), so the
    * oracles can replay the encoded WIRE length arithmetically. */
  private def storedDeflate(b: Array[Byte]): Array[Byte] = {
    require(b.length <= 0xffff,
      s"single stored block holds <= 65535 bytes, got ${b.length}")
    val out = new ByteArrayOutputStream(b.length + 5)
    out.write(0x01)
    out.write(b.length & 0xff); out.write((b.length >> 8) & 0xff)
    out.write(~b.length & 0xff); out.write((~b.length >> 8) & 0xff)
    out.write(b, 0, b.length)
    out.toByteArray
  }

  /** `Content-Encoding: deflate` — RFC 9110's zlib wrapper (RFC 1950):
    * `78 01` header, one stored block, Adler-32 big-endian. Encoded
    * length = n + 11. Synthesis-side twin; the parser decodes with the
    * independent JDK Inflater, so the round trip crosses
    * implementations. */
  private[graft] def zlibStored(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length + 11)
    out.write(0x78); out.write(0x01)
    out.write(storedDeflate(b))
    val a = new java.util.zip.Adler32(); a.update(b, 0, b.length)
    val v = a.getValue
    out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
    out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    out.toByteArray
  }

  /** `Content-Encoding: gzip` — one RFC 1952 member with zeroed MTIME,
    * XFL 0, OS 255 (unknown), one stored block, CRC-32 and ISIZE
    * little-endian. Encoded length = n + 23. */
  private[graft] def gzipStored(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length + 23)
    out.write(Array[Byte](0x1f, 0x8b.toByte, 0x08, 0x00,
      0x00, 0x00, 0x00, 0x00, 0x00, 0xff.toByte))
    out.write(storedDeflate(b))
    val c = new java.util.zip.CRC32(); c.update(b, 0, b.length)
    val v = c.getValue
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    val n = b.length.toLong
    out.write((n & 0xff).toInt); out.write(((n >> 8) & 0xff).toInt)
    out.write(((n >> 16) & 0xff).toInt); out.write(((n >> 24) & 0xff).toInt)
    out.toByteArray
  }

  /** Decode an HTTP payload per its `Content-Encoding`. Left(reason) on
    * a coding this parser does not speak or a corrupt stream — a
    * RECORD-level fault (framing is intact), so the caller surfaces it
    * on the one record and keeps parsing the blob. */
  private def decodePayload(enc: Option[String], body: Array[Byte])
      : Either[String, Array[Byte]] = enc.map(_.toLowerCase) match {
    case None | Some("identity") => Right(body)
    case Some(e @ ("gzip" | "x-gzip")) =>
      try Right(gunzip(body))
      catch { case ex @ (_: java.io.IOException | _: InflatedTooLarge) =>
        Left(s"Content-Encoding $e decode failed: ${ex.getMessage}") }
    case Some("deflate") =>
      // zlib per the RFC; raw-DEFLATE fallback for the broken servers
      // that named the bare format (a tolerance every fetcher ships).
      // A size-cap breach does NOT fall back — re-inflating the same
      // bomb raw would just burn the work twice before quarantining.
      try Right(inflate(body, raw = false))
      catch {
        case ex: InflatedTooLarge =>
          Left(s"Content-Encoding deflate decode failed: ${ex.getMessage}")
        case _: Exception =>
          try Right(inflate(body, raw = true))
          catch { case ex: Exception =>
            Left(s"Content-Encoding deflate decode failed: ${ex.getMessage}") }
      }
    case Some(other) => Left(s"unsupported Content-Encoding: $other")
  }

  /** Read one line at `pos`: bytes to the next LF (or EOF), CR stripped.
    * ISO-8859-1 so header decode is byte-transparent. Returns
    * (line, posAfterLineBreak). */
  private def readLine(data: Array[Byte], pos: Int): (String, Int) = {
    var i = pos
    while (i < data.length && data(i) != '\n') i += 1
    val end = if (i > pos && data(i - 1) == '\r') i - 1 else i
    val line = new String(data, pos, end - pos, "ISO-8859-1")
    (line, if (i < data.length) i + 1 else i)
  }

  /** Parse `name: value` header lines (case-insensitive names, leading-
    * whitespace continuations) until the empty line. Returns
    * (headers, posAfterEmptyLine) or Left(reason). */
  private def readHeaders(data: Array[Byte], pos0: Int)
      : Either[String, (Map[String, String], Int)] = {
    var pos = pos0
    var last: String = null
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    while (true) {
      if (pos >= data.length) return Left("unterminated header block")
      val (line, next) = readLine(data, pos)
      pos = next
      if (line.isEmpty) return Right((m.toMap, pos))
      else if ((line.charAt(0) == ' ' || line.charAt(0) == '\t')
          && last != null)
        m(last) = m(last) + " " + line.trim
      else {
        val c = line.indexOf(':')
        if (c <= 0) return Left(s"malformed header line: $line")
        last = line.substring(0, c).trim.toLowerCase
        m(last) = line.substring(c + 1).trim
      }
    }
    sys.error("unreachable")
  }

  /** A stripped HTTP message: status, headers, payload octets as
    * transmitted, payload decoded per `Content-Encoding`, and the
    * decode fault if any (body then left raw). */
  private final case class HttpMsg(status: Int,
      headers: Map[String, String], wireLen: Long, body: Array[Byte],
      decodeError: Option[String])

  /** Strip an HTTP message envelope from a block. None when the block
    * does not start with `HTTP/` (the record is then surfaced with its
    * raw block, not failed — real crawls contain non-HTTP
    * `application/http` mislabels). */
  private def stripHttp(block: Array[Byte]): Option[HttpMsg] = {
    if (block.length < 5 ||
        new String(block, 0, 5, "ISO-8859-1") != "HTTP/") return None
    val (statusLine, p1) = readLine(block, 0)
    val parts = statusLine.split(" ")
    val code =
      if (parts.length >= 2) scala.util.Try(parts(1).toInt).toOption
      else None
    code.flatMap { c =>
      readHeaders(block, p1).toOption.map { case (hs, bodyStart) =>
        val raw =
          java.util.Arrays.copyOfRange(block, bodyStart, block.length)
        decodePayload(hs.get("content-encoding"), raw) match {
          case Right(b)  => HttpMsg(c, hs, raw.length.toLong, b, None)
          case Left(err) => HttpMsg(c, hs, raw.length.toLong, raw, Some(err))
        }
      }
    }
  }

  /** Parse one archive blob (gzip auto-detected) into records. A blob
    * whose gzip stream is corrupt or inflates past [[MaxInflatedBytes]]
    * yields ONE quarantine row — a hostile file in a 100k-segment read
    * must never kill the job. */
  def parseBlob(blobId: Long, raw: Array[Byte]): Seq[WarcRecord] = {
    val data =
      if (isGzip(raw)) {
        try gunzip(raw)
        catch { case e @ (_: java.io.IOException | _: InflatedTooLarge) =>
          return Seq(WarcRecord(blobId, 0, None, None, None, None, None,
            -1L, None, None, None, None, None, Array.emptyByteArray,
            Some(s"blob inflate failed: ${e.getMessage}")))
        }
      } else raw
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    var idx = 0
    var failed = false
    def quarantine(reason: String): Unit = {
      out += WarcRecord(blobId, idx, None, None, None, None, None, -1L,
        None, None, None, None, None, Array.emptyByteArray, Some(reason))
      failed = true
    }
    while (!failed && pos < data.length) {
      // inter-record line breaks (the standard's two, or any padding)
      while (pos < data.length &&
          (data(pos) == '\r' || data(pos) == '\n')) pos += 1
      if (pos < data.length) {
        val (version, p1) = readLine(data, pos)
        if (!version.startsWith("WARC/")) quarantine(
          s"bad version line at offset $pos: ${version.take(40)}")
        else readHeaders(data, p1) match {
          case Left(reason) => quarantine(reason)
          case Right((hs, bodyStart)) =>
            hs.get("content-length")
                .flatMap(v => scala.util.Try(v.toLong).toOption) match {
              case None => quarantine("missing or non-numeric Content-Length")
              case Some(len) if len < 0 =>
                // Try(v.toLong) happily parses "-5"; without this gate the
                // truncation guard passes and copyOfRange throws, killing
                // the task instead of quarantining the one bad record
                quarantine(s"negative Content-Length: $len")
              case Some(len) if bodyStart + len > data.length =>
                quarantine(s"truncated block: declared $len octets, " +
                  s"${data.length - bodyStart} remain")
              case Some(len) =>
                val block = java.util.Arrays.copyOfRange(
                  data, bodyStart, bodyStart + (len.toInt))
                val ct = hs.get("content-type")
                val http =
                  if (ct.exists(_.toLowerCase.startsWith("application/http")))
                    stripHttp(block)
                  else None
                out += WarcRecord(blobId, idx,
                  warc_type = hs.get("warc-type"),
                  record_id = hs.get("warc-record-id"),
                  target_uri = hs.get("warc-target-uri"),
                  warc_date = hs.get("warc-date"),
                  content_type = ct,
                  content_length = len,
                  http_status = http.map(_.status),
                  http_content_type = http.flatMap(_.headers.get("content-type")),
                  http_location = http.flatMap(_.headers.get("location")),
                  http_content_encoding =
                    http.flatMap(_.headers.get("content-encoding")),
                  http_wire_len = http.map(_.wireLen),
                  body = http.map(_.body).getOrElse(block),
                  error = http.flatMap(_.decodeError))
                idx += 1
                pos = bodyStart + len.toInt
            }
        }
      }
    }
    out.result()
  }

  /** Append one record in standard framing (CRLF, length-based). */
  def writeRecord(out: ByteArrayOutputStream,
      headers: Seq[(String, String)], block: Array[Byte]): Unit = {
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("WARC/1.0\r\n")
    headers.foreach { case (k, v) => w(s"$k: $v\r\n") }
    w(s"Content-Length: ${block.length}\r\n\r\n")
    out.write(block)
    w("\r\n\r\n")
  }

  /** First capture group of `pattern` as a nullable long (ANSI-safe:
    * regexp_extract's no-match "" would fail a plain cast). */
  private def extractedId(c: org.apache.spark.sql.Column,
      pattern: String): org.apache.spark.sql.Column = {
    val s = regexp_extract(c, pattern, 1)
    when(s === "", lit(null)).otherwise(s).cast("long")
  }

  // ------------------------------------------------------------ operators

  /** Typed records from a (blob_id, payload binary) frame — narrow
    * mapPartitions, each blob's records emitted contiguously in order. */
  def recordsOf(blobs: DataFrame): Dataset[WarcRecord] = {
    import blobs.sparkSession.implicits._
    blobs.select(col("blob_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (b, bytes) => parseBlob(b, bytes) })
  }

  /** `binaryFile` rows → the (blob_id, payload) contract shared by the
    * batch and streaming readers. `blob_id` is the file name's trailing
    * number when present, else a 64-bit hash of the path. */
  private[graft] def blobFrameOf(files: DataFrame): DataFrame =
    files.select(
      coalesce(extractedId(col("path"), "(\\d+)\\.warc"),
        xxhash64(col("path"))).as("blob_id"),
      col("content").as("payload"))

  /** The `binaryFile` source's fixed schema — file STREAMING sources
    * require it stated explicitly. */
  private[graft] val BinaryFileSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))

  /** Read a directory of `.warc` / `.warc.gz` files: one task per file
    * (`binaryFile` is unsplittable — the CommonCrawl model, parallelism
    * = file count). */
  def readWarcDir(spark: SparkSession, path: String,
      glob: String = "*.warc*"): Dataset[WarcRecord] =
    recordsOf(blobFrameOf(spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(path)))

  /** Streaming twin of [[readWarcDir]] — archive segments landing in a
    * directory become micro-batches of (blob_id, payload).
    * `maxFilesPerTrigger` bounds a micro-batch the way the CSV ingest
    * stage does (StreamingIngest): segments are ~1 GiB each, so the
    * trigger size IS the memory bound per micro-batch. */
  def readWarcStream(spark: SparkSession, path: String,
      glob: String = "*.warc*", maxFilesPerTrigger: Int = 8): DataFrame =
    blobFrameOf(spark.readStream.format("binaryFile")
      .schema(BinaryFileSchema)
      .option("pathGlobFilter", glob)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(path))

  /** (doc_id, url) frame of admitted fetches from a (blob_id, payload)
    * frame — the hand-off shape the frontier stages (robots policy
    * q139, domain caps q144, admission q150) consume. */
  def fetchUrlsOf(blobs: DataFrame): DataFrame =
    fetchOkOf(recordsOf(blobs)).toDF()
      .select(extractedId(col("record_id"), "doc:(\\d+)").as("doc_id"),
        col("target_uri").as("url"))

  /** The standard fetch gate: well-formed response records that came
    * back HTTP 200. */
  def fetchOkOf(records: Dataset[WarcRecord]): Dataset[WarcRecord] =
    records.filter(r => r.error.isEmpty && r.warc_type.contains("response")
      && r.http_status.contains(200))

  /** WARC→WET derivation: each admitted response record re-emitted as a
    * `conversion` record (payload only, `WARC-Refers-To` lineage, URI
    * and date preserved), one gzip blob per source blob. Zero shuffle:
    * [[recordsOf]] emits each blob's records contiguously, so grouping
    * consecutive runs inside the partition suffices. */
  def wetBlobsOf(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    fetchOkOf(records).mapPartitions { it =>
      val buf = it.buffered
      new Iterator[(Long, Array[Byte])] {
        def hasNext: Boolean = buf.hasNext
        def next(): (Long, Array[Byte]) = {
          val b = buf.head.blob_id
          var recs = Vector.empty[WarcRecord]
          while (buf.hasNext && buf.head.blob_id == b) recs :+= buf.next()
          val out = new ByteArrayOutputStream()
          recs.sortBy(_.rec_idx).foreach { r =>
            val docId = r.record_id
              .flatMap("doc:(\\d+)".r.findFirstMatchIn(_))
              .map(_.group(1)).getOrElse("x")
            writeRecord(out, Seq(
              "WARC-Type" -> "conversion",
              "WARC-Record-ID" -> s"<urn:graft:wet:$docId>",
              "WARC-Refers-To" -> r.record_id.getOrElse(""),
              "WARC-Target-URI" -> r.target_uri.getOrElse(""),
              "WARC-Date" -> r.warc_date.getOrElse(""),
              "Content-Type" -> "text/plain"), r.body)
          }
          (b, gzip(out.toByteArray))
        }
      }
    }.toDF("blob_id", "payload")
  }

  // ------------------------------------------------------------ synthesis

  /** Docs per synthesized archive blob (registered queries). */
  val RecordsPerBlob = 8L

  /** 2024-01-01T00:00:00Z — synthesis epoch for WARC-Date. */
  val BaseEpoch = 1704067200L

  private def isoDate(epoch: Long): String =
    java.time.Instant.ofEpochSecond(epoch).toString

  private[ext] def statusOf(id: Long): (Int, String) =
    if (id % 10 == 3) (404, "Not Found")
    else if (id % 10 == 7) (301, "Moved Permanently")
    else (200, "OK")

  /** Deterministic redirect target for a 301 doc (id ≡ 7 mod 10) — the
    * `Location:` the synthesized envelope carries, chosen so every
    * chain class exists in the corpus and q158's resolver is exercised
    * end to end:
    *   - id ≡ 97 (mod 100): SELF-LOOP (Location = own URL) → the
    *     bounded walk must refuse it as cap_exceeded;
    *   - id ≡ 7 or 17 (mod 30): hop to id+10 (also ≡ 7 mod 10, another
    *     301) → 3-hop and 2-hop chains respectively;
    *   - otherwise: hop to id+3 (≡ 0 mod 10 — always a 200 response,
    *     never a conversion since 0 mod 5 ≠ 4) → 1-hop resolution.
    * A target beyond the corpus' max doc_id was never fetched → the
    * resolver's `dangling` arm (fires at sf0.001, where doc 47 → 57).
    * Replayed by [[redirectTargetSql]] in the q153/q158 oracles. */
  private[graft] def redirectTargetOf(id: Long): Long =
    if (id % 100 == 97) id
    else if (id % 30 == 7 || id % 30 == 17) id + 10
    else id + 3

  /** SQL twin of [[redirectTargetOf]] over an id expression. */
  private[graft] def redirectTargetSql(id: String): String =
    s"""CASE WHEN ($id) % 100 = 97 THEN ($id)
             WHEN ($id) % 30 IN (7, 17) THEN ($id) + 10
             ELSE ($id) + 3 END"""

  private[ext] def isConversion(id: Long): Boolean = id % 5 == 4

  /** Deterministic `Content-Encoding` for a synthesized response —
    * chosen so every decode arm is exercised and every wire length is
    * oracle-replayable (stored-DEFLATE blocks only, see
    * [[storedDeflate]]):
    *   - id ≡ 2 (mod 100): header says `br` but the body is PLAIN (the
    *     lying-server case) → the parser flags `unsupported
    *     Content-Encoding: br`, keeps the raw body, and the fetch gate
    *     drops the record;
    *   - id ≡ 1 (mod 10): `gzip` (RFC 1952 member, wire = n + 23);
    *   - id ≡ 6 (mod 20): `deflate` carrying RAW DEFLATE (the
    *     broken-server variant, wire = n + 5) → exercises the
    *     zlib-then-raw fallback;
    *   - id ≡ 16 (mod 20): `deflate` carrying the RFC-correct zlib
    *     wrapper (wire = n + 11);
    *   - otherwise identity (no header).
    * All encoded ids end in 1/2/6 — never 3 or 7 — so every encoded
    * record is an HTTP 200 and flows through the fetch gate, where
    * q155's md5 pin proves byte-exact decode. */
  private[ext] def encodingOf(id: Long): Option[String] =
    if (isConversion(id)) None
    else if (id % 100 == 2) Some("br")
    else if (id % 10 == 1) Some("gzip")
    else if (id % 10 == 6) Some("deflate")
    else None

  /** SQL twin of [[encodingOf]] (NULL for conversions and identity). */
  private[graft] def encodingSql(id: String): String =
    s"""CASE WHEN ($id) % 5 = 4 THEN NULL
             WHEN ($id) % 100 = 2 THEN 'br'
             WHEN ($id) % 10 = 1 THEN 'gzip'
             WHEN ($id) % 10 = 6 THEN 'deflate'
             ELSE NULL END"""

  /** SQL twin of the encoded wire length over a response body of `n`
    * octets: the stored-block constructions are byte-deterministic, so
    * the transmitted size is pure arithmetic (br is planted plain). */
  private[graft] def wireLenSql(id: String, n: String): String =
    s"""CASE WHEN ($id) % 5 = 4 THEN ($n)
             WHEN ($id) % 10 = 1 THEN ($n) + 23
             WHEN ($id) % 20 = 6 THEN ($n) + 5
             WHEN ($id) % 20 = 16 THEN ($n) + 11
             ELSE ($n) END"""

  /** Build one archive blob: a `warcinfo` record, then one record per
    * doc (sorted) — `conversion`/text-plain for every fifth doc, else
    * `response` wrapping an HTTP envelope whose status cycles through
    * 200/301/404 by doc_id arithmetic (so the fetch gate is exercised).
    * Every rule is replayed by the DuckDB oracles. */
  private[ext] def synthesizeBlob(blobId: Long,
      docs: Seq[(Long, String)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeRecord(out, Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> s"<urn:graft:info:$blobId>",
      "WARC-Date" -> isoDate(BaseEpoch + blobId),
      "Content-Type" -> "application/warc-fields"),
      "software: graft\r\n".getBytes("UTF-8"))
    docs.sortBy(_._1).foreach { case (id, text) =>
      val payload = text.getBytes("UTF-8")
      val common = Seq(
        "WARC-Record-ID" -> s"<urn:graft:doc:$id>",
        "WARC-Target-URI" -> UrlCurate.synthUrlScala(id),
        "WARC-Date" -> isoDate(BaseEpoch + id))
      if (isConversion(id))
        writeRecord(out, ("WARC-Type" -> "conversion") +: common :+
          ("Content-Type" -> "text/plain"), payload)
      else {
        val (code, reason) = statusOf(id)
        val enc = encodingOf(id)
        val wire = enc match {
          case Some("gzip")    => gzipStored(payload)
          case Some("deflate") =>
            if (id % 20 == 6) storedDeflate(payload) else zlibStored(payload)
          case _               => payload // identity, and the lying `br`
        }
        val location =
          if (code == 301)
            s"Location: ${UrlCurate.synthUrlScala(redirectTargetOf(id))}\r\n"
          else ""
        val envelope = s"HTTP/1.1 $code $reason\r\n" +
          s"Content-Type: text/html\r\n" +
          enc.map(e => s"Content-Encoding: $e\r\n").getOrElse("") +
          location +
          s"Content-Length: ${wire.length}\r\n\r\n"
        writeRecord(out, ("WARC-Type" -> "response") +: common :+
          ("Content-Type" -> "application/http;msgtype=response"),
          envelope.getBytes("ISO-8859-1") ++ wire)
      }
    }
    out.toByteArray
  }

  /** (blob_id, payload) frame of synthesized archives over the corpus —
    * `doc_id / 8` contiguous groups. The groupByKey here is test-INPUT
    * construction (real ingestion starts from files via
    * [[readWarcDir]], no shuffle); it is not part of the operator. */
  def synthesizeWarcBlobsOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .groupByKey(_._1 / RecordsPerBlob)
      .mapGroups { (b, it) => (b, synthesizeBlob(b, it.toSeq)) }
      .toDF("blob_id", "payload")
  }

  // ------------------------------------------------------- registered qs

  /** q153: full record inventory of the synthesized archives — every
    * header field, framing length, HTTP envelope split, and a body
    * prefix, one row per record including the `warcinfo` rows. `error`
    * is emitted (not filtered) so a parser regression can never hide as
    * a silently shorter result. ORDER BY = oracle determinism only. */
  def warcRecords(spark: SparkSession, dir: String): DataFrame =
    recordsOf(synthesizeWarcBlobsOf(Tables(spark, dir, "documents")))
      .toDF()
      .select(col("blob_id"), col("rec_idx"), col("warc_type"),
        col("record_id"), col("target_uri"), col("warc_date"),
        col("content_type"), col("content_length"), col("http_status"),
        col("http_content_type"), col("http_location"),
        col("http_content_encoding"),
        octet_length(col("body")).cast("long").as("body_len"),
        substring(col("body").cast("string"), 1, 48).as("body_head"),
        extractedId(col("record_id"), "doc:(\\d+)").as("doc_id"),
        col("error"))
      .orderBy(col("blob_id"), col("rec_idx"))

  /** Oracle for q153 [[warcRecords]] — synthesis arithmetic replayed:
    * record order within a blob (warcinfo first, docs by id), the
    * length-framed Content-Length including the HTTP envelope, and the
    * envelope split. */
  lazy val warcRecordsOracle: String = {
    val date = "strftime(TIMESTAMP '2024-01-01 00:00:00' + " +
      "to_seconds(%s), '%%Y-%%m-%%dT%%H:%%M:%%SZ')"
    s"""WITH ${UrlCurate.urlCte},
       d AS (SELECT doc_id, text, doc_id // 8 AS blob_id,
           CASE WHEN doc_id % 10 = 3 THEN 404
                WHEN doc_id % 10 = 7 THEN 301 ELSE 200 END AS code,
           CASE WHEN doc_id % 10 = 3 THEN 'Not Found'
                WHEN doc_id % 10 = 7 THEN 'Moved Permanently'
                ELSE 'OK' END AS reason,
           ${UrlCurate.urlExprSql(redirectTargetSql("doc_id"))}
             AS loc_url,
           ${encodingSql("doc_id")} AS enc,
           ${wireLenSql("doc_id", "length(text)")} AS wlen,
           (doc_id % 5 = 4) AS conv
         FROM documents),
       docrec AS (SELECT d.blob_id,
           CAST(row_number() OVER (PARTITION BY d.blob_id
             ORDER BY d.doc_id) AS INT) AS rec_idx,
           CASE WHEN conv THEN 'conversion' ELSE 'response' END
             AS warc_type,
           '<urn:graft:doc:' || d.doc_id || '>' AS record_id,
           u.url AS target_uri,
           ${date.format("d.doc_id")} AS warc_date,
           CASE WHEN conv THEN 'text/plain'
                ELSE 'application/http;msgtype=response' END
             AS content_type,
           CAST(CASE WHEN conv THEN length(text)
                ELSE length('HTTP/1.1 ' || code || ' ' || reason) + 2
                   + length('Content-Type: text/html') + 2
                   + CASE WHEN d.enc IS NOT NULL
                       THEN length('Content-Encoding: ' || d.enc) + 2
                       ELSE 0 END
                   + CASE WHEN code = 301
                       THEN length('Location: ' || d.loc_url) + 2
                       ELSE 0 END
                   + length('Content-Length: ' || d.wlen) + 2 + 2
                   + d.wlen END AS BIGINT) AS content_length,
           CASE WHEN conv THEN NULL ELSE code END AS http_status,
           CASE WHEN conv THEN NULL ELSE 'text/html' END
             AS http_content_type,
           CASE WHEN NOT conv AND code = 301 THEN d.loc_url END
             AS http_location,
           d.enc AS http_content_encoding,
           CAST(length(text) AS BIGINT) AS body_len,
           substr(text, 1, 48) AS body_head,
           d.doc_id AS doc_id,
           CASE WHEN NOT conv AND d.doc_id % 100 = 2
             THEN 'unsupported Content-Encoding: br' END AS error
         FROM d JOIN u ON u.doc_id = d.doc_id),
       info AS (SELECT blob_id, 0 AS rec_idx, 'warcinfo' AS warc_type,
           '<urn:graft:info:' || blob_id || '>' AS record_id,
           CAST(NULL AS VARCHAR) AS target_uri,
           ${date.format("blob_id")} AS warc_date,
           'application/warc-fields' AS content_type,
           CAST(17 AS BIGINT) AS content_length,
           CAST(NULL AS INT) AS http_status,
           CAST(NULL AS VARCHAR) AS http_content_type,
           CAST(NULL AS VARCHAR) AS http_location,
           CAST(NULL AS VARCHAR) AS http_content_encoding,
           CAST(17 AS BIGINT) AS body_len,
           'software: graft' || chr(13) || chr(10) AS body_head,
           CAST(NULL AS BIGINT) AS doc_id,
           CAST(NULL AS VARCHAR) AS error
         FROM (SELECT DISTINCT doc_id // 8 AS blob_id FROM documents))
       SELECT * FROM info UNION ALL SELECT * FROM docrec
       ORDER BY blob_id, rec_idx"""
  }

  /** q154: the crawl's first aggregate — parse, gate on fetch status
    * (well-formed HTTP 200 responses only), canonicalize the target
    * URI, resolve the registrable domain, drop blocklisted domains, and
    * roll up admitted docs and payload bytes per domain. One narrow
    * parse + the URL chain's narrow maps + ONE hash aggregate. */
  def warcFetch(spark: SparkSession, dir: String): DataFrame = {
    val ok = fetchOkOf(recordsOf(synthesizeWarcBlobsOf(
        Tables(spark, dir, "documents")))).toDF()
      .select(col("target_uri").as("url"),
        octet_length(col("body")).cast("long").as("n_bytes"))
    UrlCurate.blocklistOf(UrlCurate.registrableDomainOf(
        UrlCurate.canonicalizeOf(ok)))
      .filter(!col("blocked") && col("host").isNotNull)
      .withColumn("domain",
        coalesce(col("registrable_domain"), col("host")))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("sum_bytes"))
      .orderBy(col("domain"))
  }

  /** Oracle for q154 [[warcFetch]] — the shared curate chain restricted
    * to docs synthesized as HTTP-200 responses. */
  lazy val warcFetchOracle: String =
    s"""WITH ${UrlCurate.curateCte},
       st AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes
         FROM documents
         WHERE doc_id % 5 <> 4 AND doc_id % 10 NOT IN (3, 7)
           AND doc_id % 100 <> 2 /* br decode fault -> gate drops it */)
       SELECT coalesce(b.registrable_domain, b.host) AS domain,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(s.n_bytes) AS BIGINT) AS sum_bytes
       FROM blk b JOIN st s ON s.doc_id = b.doc_id
       WHERE NOT b.blocked AND b.host IS NOT NULL
       GROUP BY 1 ORDER BY domain"""

  /** q155: WARC→WET roundtrip — synthesize archives, parse, derive WET
    * conversion blobs ([[wetBlobsOf]], gzip on the write path so the
    * inflate path is exercised end to end), parse THOSE back, and emit
    * per-doc digests. `body_md5` equal to the source text's md5 pins
    * byte-exact payload preservation through write → gzip → inflate →
    * parse (the q109 exact-twin idiom). */
  def wetRoundtrip(spark: SparkSession, dir: String): DataFrame =
    recordsOf(wetBlobsOf(recordsOf(synthesizeWarcBlobsOf(
        Tables(spark, dir, "documents")))))
      .toDF()
      .select(
        extractedId(col("record_id"), "wet:(\\d+)").as("doc_id"),
        col("warc_type"), col("content_type"), col("target_uri"),
        octet_length(col("body")).cast("long").as("body_len"),
        md5(col("body")).as("body_md5"))
      .orderBy(col("doc_id"))

  /** Oracle for q155 [[wetRoundtrip]]. */
  lazy val wetRoundtripOracle: String =
    s"""WITH ${UrlCurate.urlCte}
       SELECT d.doc_id, 'conversion' AS warc_type,
         'text/plain' AS content_type, u.url AS target_uri,
         CAST(length(d.text) AS BIGINT) AS body_len,
         md5(d.text) AS body_md5
       FROM documents d JOIN u ON u.doc_id = d.doc_id
       WHERE d.doc_id % 5 <> 4 AND d.doc_id % 10 NOT IN (3, 7)
         AND d.doc_id % 100 <> 2 /* br decode fault -> gate drops it */
       ORDER BY d.doc_id"""

  /** q159: HTTP `Content-Encoding` inventory over the synthesized
    * crawl's response records — per record: the declared coding, the
    * transmitted (wire) octets, the decoded octets, the transfer
    * overhead, and the decode fault when the parser cannot honor the
    * coding (the lying `br` rows). Pins the decode gate end to end:
    * wire lengths are the stored-block arithmetic (gzip n+23,
    * raw-deflate n+5, zlib-deflate n+11), decoded lengths equal the
    * source text, and exactly the `br` rows carry errors. Narrow
    * parse + projection — no shuffle beyond the synthesis input. */
  def warcEncodings(spark: SparkSession, dir: String): DataFrame =
    recordsOf(synthesizeWarcBlobsOf(Tables(spark, dir, "documents")))
      .toDF()
      .filter(col("http_status").isNotNull)
      .select(
        extractedId(col("record_id"), "doc:(\\d+)").as("doc_id"),
        col("http_status"),
        col("http_content_encoding").as("encoding"),
        col("http_wire_len").as("wire_len"),
        octet_length(col("body")).cast("long").as("body_len"),
        (col("http_wire_len") - octet_length(col("body")).cast("long"))
          .as("overhead_bytes"),
        col("error"))
      .orderBy(col("doc_id"))

  /** Oracle for q159 [[warcEncodings]] — synthesis arithmetic replayed
    * ([[encodingSql]] / [[wireLenSql]]). */
  lazy val warcEncodingsOracle: String =
    s"""SELECT doc_id,
         CASE WHEN doc_id % 10 = 3 THEN 404
              WHEN doc_id % 10 = 7 THEN 301 ELSE 200 END AS http_status,
         ${encodingSql("doc_id")} AS encoding,
         CAST(${wireLenSql("doc_id", "length(text)")} AS BIGINT)
           AS wire_len,
         CAST(length(text) AS BIGINT) AS body_len,
         CAST(${wireLenSql("doc_id", "length(text)")} - length(text)
           AS BIGINT) AS overhead_bytes,
         CASE WHEN doc_id % 100 = 2
           THEN 'unsupported Content-Encoding: br' END AS error
       FROM documents
       WHERE doc_id % 5 <> 4
       ORDER BY doc_id"""

  /** The crawl-to-corpus rollup over any (blob_id, payload) archive
    * frame — the reusable operator behind q162 and the streaming
    * stage: parse (q153, Content-Encoding decoded) → fetch gate
    * (q154) → WET text derivation (q155) → the q145 integer quality
    * gate → per-domain fetched / admitted / token counts. Every
    * output column is ADDITIVE (counts and sums), so per-batch
    * results merge by summation. Sort-free.
    *
    * Scale: every step before the final aggregate is narrow (parse,
    * WET grouping of blob-contiguous runs, URL maps, token counts);
    * ONE hash aggregate on domain ends it. */
  def crawlCorpusOf(blobs: DataFrame): DataFrame =
    crawlCorpusOfWet(recordsOf(wetBlobsOf(recordsOf(blobs))).toDF()
      .select(col("target_uri").as("url"),
        col("body").cast("string").as("text")))

  /** [[crawlCorpusOf]] from an already-derived WET frame (url, text) —
    * the form the registered q162 runs over the session WET memo. */
  def crawlCorpusOfWet(wet: DataFrame): DataFrame = {
    val gated = Shards.withQualityGate(wet.select(col("url"), col("text")))
    UrlCurate.blocklistOf(UrlCurate.registrableDomainOf(
        UrlCurate.canonicalizeOf(gated)))
      .filter(!col("blocked") && col("host").isNotNull)
      .withColumn("domain",
        coalesce(col("registrable_domain"), col("host")))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_fetched"),
        sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"),
        sum(when(col("admitted"), col("_toks")).otherwise(0L))
          .as("tok_admitted"))
  }

  /** q162: [[crawlCorpusOf]] over the synthesized archives — the whole
    * front door in ONE oracled query: the text being gated went
    * through synthesize → WARC framing → HTTP envelope → content
    * encoding → WET rewrite → gzip → parse-back before a single token
    * was counted. ORDER BY = oracle determinism only. */
  def crawlCorpus(spark: SparkSession, dir: String): DataFrame =
    crawlCorpusOfWet(wetDocs(spark, dir))
      .orderBy(col("domain"))

  /** The parsed crawl-front WET frame (doc_id, url, text) over the
    * synthesized archives, materialized ONCE PER SESSION: the four
    * registered crawl queries (q162/q163/q165/q166) are downstream
    * READS of one parse → fetch gate → WET derivation, exactly the
    * shared-artifact shape the near-dup pair index set the policy for
    * ([[Curate.neardupPairs]]) — a production front door parses each
    * archive once and every consumer reads the extracted corpus. Each
    * query's RESULT is identical with or without the memo
    * (CrawlReleaseSpec pins registered ≡ pure-from-blobs for all
    * three rollups); only the repeat parse cost collapses. */
  private[graft] def wetDocs(spark: SparkSession, dir: String): DataFrame =
    graft.SessionMemo(spark, s"crawl-wet:$dir") {
      recordsOf(wetBlobsOf(recordsOf(synthesizeWarcBlobsOf(
          Tables(spark, dir, "documents"))))).toDF()
        .select(extractedId(col("record_id"), "wet:(\\d+)").as("doc_id"),
          col("target_uri").as("url"),
          col("body").cast("string").as("text"))
        .localCheckpoint()
    }

  /** Oracle for q162 [[crawlCorpus]] — the fetch-gate id set, the
    * integer quality gate, and the curate chain replayed. */
  lazy val crawlCorpusOracle: String = {
    val stops = TextAnalysis.stopwordList.map("'" + _ + "'").mkString(",")
    s"""WITH ${UrlCurate.curateCte},
       st AS (SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
           CAST(len(list_filter(string_split(text, ' '),
             x -> list_contains([$stops], x))) AS BIGINT) AS stops
         FROM documents
         WHERE doc_id % 5 <> 4 AND doc_id % 10 NOT IN (3, 7)
           AND doc_id % 100 <> 2)
       SELECT coalesce(b.registrable_domain, b.host) AS domain,
         CAST(count(*) AS BIGINT) AS n_fetched,
         CAST(sum(CASE WHEN s.toks >= 20 AND s.stops * 100 >= s.toks * 2
           THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
         CAST(sum(CASE WHEN s.toks >= 20 AND s.stops * 100 >= s.toks * 2
           THEN s.toks ELSE 0 END) AS BIGINT) AS tok_admitted
       FROM blk b JOIN st s ON s.doc_id = b.doc_id
       WHERE NOT b.blocked AND b.host IS NOT NULL
       GROUP BY 1 ORDER BY domain"""
  }

  /** q163: raw crawl archives to TRAINING SHARDS — q162's admission
    * (fetch gate → WET text → integer quality gate → blocklist) handed
    * to the q143 delivery layout: DetMix shard assignment over the
    * admitted doc_ids and the per-shard manifest (counts, token sums,
    * ranges, the order-independent checksum). The complete
    * CommonCrawl-to-release path as ONE oracled query; the WET doc_id
    * (from the `wet:<id>` lineage) keys the assignment, so the shard a
    * document lands in is identical whether it arrived via the crawl
    * front or the curated-corpus path (q145) — delivery is
    * source-independent by construction. */
  def crawlShards(spark: SparkSession, dir: String): DataFrame =
    Shards.manifestOf(Shards.shardAssignOf(
        crawlAdmittedOfWet(wetDocs(spark, dir))
          .select(col("doc_id"), col("text"))))
      .orderBy(col("shard_id"))

  /** Oracle for q163 [[crawlShards]] — the q162 admission set fed to
    * the q143 manifest arithmetic. */
  lazy val crawlShardsOracle: String = {
    val stops = TextAnalysis.stopwordList.map("'" + _ + "'").mkString(",")
    s"""WITH ${UrlCurate.curateCte},
       st AS (SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
           CAST(len(list_filter(string_split(text, ' '),
             x -> list_contains([$stops], x))) AS BIGINT) AS stops
         FROM documents
         WHERE doc_id % 5 <> 4 AND doc_id % 10 NOT IN (3, 7)
           AND doc_id % 100 <> 2),
       adm AS (SELECT s.doc_id, s.toks FROM blk b
         JOIN st s ON s.doc_id = b.doc_id
         WHERE NOT b.blocked AND b.host IS NOT NULL
           AND s.toks >= 20 AND s.stops * 100 >= s.toks * 2),
       a AS (SELECT doc_id, toks AS n_tokens,
           CAST(${graft.functions.DetMix.mixSql("doc_id", Shards.Seed)}
             % ${Shards.NShards} AS INT) AS shard_id,
           ${graft.functions.DetMix.mixSql("doc_id", Shards.Seed + 1)}
             AS fp
         FROM adm)
       SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
         CAST(sum(fp) AS BIGINT) AS checksum
       FROM a GROUP BY shard_id ORDER BY shard_id"""
  }

  /** The DEDUP stage composed into the crawl front — the refinery
    * shape every web-scale curation pipeline runs (CCNet, RefinedWeb,
    * FineWeb all dedup between extraction and delivery): the admitted
    * WET corpus through exact content dedup (q21's keep-min digest
    * groupBy) then near-dup clustering (q23's exact word-3-gram
    * Jaccard ≥ 0.8 pairs → q48's connected components, keep the
    * component representative), rolled up per registrable domain.
    *
    * `admitted` = (doc_id, domain, text, _toks); `pairs` = a near-dup
    * pair index (a, b) derived over a SUPER-corpus of the admitted
    * ids. Restricting the index to admitted-keeper endpoints is EXACT,
    * not an approximation: n-gram Jaccard is pairwise, so the pair set
    * of any sub-corpus is precisely the full pair set with both
    * endpoints in the sub-corpus (CrawlDedupSpec proves the identity
    * against a from-scratch derivation over the keepers alone). That
    * is what makes the stage nearly free here: the session pair index
    * (shared with q48/q53/q60/q103) is reused as two semi joins on
    * long ids instead of re-deriving the dominant shingle self-join.
    * The identity holds even when exact duplicates collapse before the
    * restriction: identical texts have identical shingle sets, so a
    * true Jaccard pair set over the super-corpus contains the same
    * edges for every member of an exact-duplicate group — whichever
    * copy survives keep-min, its edges are present.
    *
    * Scale: the digest groupBy ships 32-byte digests (map-side
    * partial — exact-duplicate groups collapse before the exchange);
    * the index restriction is two semi joins on longs; connected
    * components runs over the restricted edge list (pairs, not
    * corpus, sized); the final rollup joins carry ids and longs only —
    * text never enters an exchange after the digest hash. */
  def crawlDedupOf(admitted: DataFrame, pairs: DataFrame): DataFrame =
    dedupRollupOf(dedupFlagsOf(admitted, pairs))

  /** The q165 per-domain accounting over a flags frame. */
  private def dedupRollupOf(flags: DataFrame): DataFrame =
    flags
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_admitted"),
        sum(when(col("_ek") === 1, 1L).otherwise(0L))
          .as("n_exact_unique"),
        sum(when(col("_ek") === 1 && col("_nd").isNull, 1L).otherwise(0L))
          .as("n_kept"),
        sum(when(col("_ek") === 1 && col("_nd").isNull, col("_toks"))
          .otherwise(0L)).as("tok_kept"))

  /** The admitted frame with the two survivor flags appended — `_ek`
    * (exact-dedup keeper: smallest id of its content-digest group) and
    * `_nd` (near-dup non-representative: in a restricted-pair
    * component whose minimum it is not). Shared by the q165 accounting
    * and the q166 release path so the survivor definition can never
    * diverge between them. */
  private def dedupFlagsOf(admitted: DataFrame,
      pairs: DataFrame): DataFrame = {
    val keep = admitted
      .groupBy(md5(col("text").cast("binary")).as("digest"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), lit(1).as("_ek"))
    val subPairs = pairs
      .join(keep.select(col("doc_id").as("a")), Seq("a"), "left_semi")
      .join(keep.select(col("doc_id").as("b")), Seq("b"), "left_semi")
    val dropped = Curate.connectedComponents(subPairs)
      .filter(col("node") =!= col("comp"))
      .select(col("node").as("doc_id"), lit(1).as("_nd"))
    admitted
      .join(keep, Seq("doc_id"), "left")
      .join(dropped, Seq("doc_id"), "left")
  }

  /** The dedup SURVIVOR set itself — exact keepers that are their
    * component's representative. What delivery ships. */
  private[graft] def crawlKeptOf(admitted: DataFrame,
      pairs: DataFrame): DataFrame =
    keptFromFlags(dedupFlagsOf(admitted, pairs))

  private def keptFromFlags(flags: DataFrame): DataFrame =
    flags
      .filter(col("_ek") === 1 && col("_nd").isNull)
      .drop("_ek", "_nd")

  /** The flags frame of the crawl front, materialized once per
    * session: q165's rollup, q166's release, and q167's language
    * accounting all read the same survivor flags — the shared-artifact
    * policy one stage downstream of [[wetDocs]] (the connected-
    * components pass and the digest groupBy run once, not per query).
    * Result-invariance vs the pure forms is spec-pinned in
    * CrawlReleaseSpec. */
  private[graft] def crawlFlags(spark: SparkSession,
      dir: String): DataFrame =
    graft.SessionMemo(spark, s"crawl-dedup-flags:$dir") {
      dedupFlagsOf(crawlAdmittedOfWet(wetDocs(spark, dir)),
          Curate.neardupPairs(spark, dir))
        .localCheckpoint()
    }

  /** The q162 admission set (fetch gate → WET → blocklist → quality
    * gate), shaped for [[crawlDedupOf]]: (doc_id, domain, text,
    * _toks). WET bodies are byte-exact round trips of the source text
    * (q155-pinned), so the `documents`-derived pair index applies to
    * the crawl-front corpus verbatim. */
  private[graft] def crawlAdmittedOf(blobs: DataFrame): DataFrame =
    crawlAdmittedOfWet(recordsOf(wetBlobsOf(recordsOf(blobs))).toDF()
      .select(extractedId(col("record_id"), "wet:(\\d+)").as("doc_id"),
        col("target_uri").as("url"),
        col("body").cast("string").as("text")))

  /** [[crawlAdmittedOf]] from an already-derived WET frame (doc_id,
    * url, text) — the form q163/q165/q166 run over the session memo. */
  private[graft] def crawlAdmittedOfWet(wet: DataFrame): DataFrame =
    Shards.withQualityGate(
        UrlCurate.blocklistOf(UrlCurate.registrableDomainOf(
          UrlCurate.canonicalizeOf(wet))))
      .filter(!col("blocked") && col("host").isNotNull && col("admitted"))
      .withColumn("domain",
        coalesce(col("registrable_domain"), col("host")))
      .select(col("doc_id"), col("domain"), col("text"), col("_toks"))

  /** q165: crawl-front dedup accounting — the admitted corpus through
    * exact + near-dup dedup, per domain: how many fetched documents
    * were admitted, how many distinct contents remain after exact
    * dedup, how many survive near-dup representative selection, and
    * the surviving token mass (what delivery would actually ship).
    * The corpus has no exact duplicates (every text distinct), so the
    * exact stage passes through structurally here — its drop behavior
    * is fixture-proven in CrawlDedupSpec — while the near-dup stage
    * drops real pairs. ORDER BY = oracle determinism only. */
  def crawlDedup(spark: SparkSession, dir: String): DataFrame =
    dedupRollupOf(crawlFlags(spark, dir))
      .orderBy(col("domain"))

  /** Shared oracle fragment: the dedup survivor chain — q165's stages
    * (token/stopword stats `st`, fetch-gate admission `adm`, exact
    * keep-min `ek`, the 3-gram Jaccard pair derivation restricted to
    * the exact keepers `w`..`prs`, and the recursive transitive
    * closure `walk`/`ccd` ending at the non-representatives `nd`).
    * Composed into all four crawl oracles (q165/q166/q167/q168) so
    * the dedup semantics — the 0.8 threshold, the keep-min rule, the
    * fetch-gate moduli — have exactly ONE SQL definition; callers
    * append their own `kept` variant. `withDomain` adds q165's
    * per-domain attribution column to `adm`. Expects
    * [[UrlCurate.curateCte]] (for `blk`) ahead of it under a
    * `WITH RECURSIVE` header (for `walk`). */
  private def crawlSurvivorCte(withDomain: Boolean): String = {
    val stops = TextAnalysis.stopwordList.map("'" + _ + "'").mkString(",")
    val dom = if (withDomain)
      ",\n           coalesce(b.registrable_domain, b.host) AS domain"
    else ""
    s"""st AS (SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
           CAST(len(list_filter(string_split(text, ' '),
             x -> list_contains([$stops], x))) AS BIGINT) AS stops
         FROM documents
         WHERE doc_id % 5 <> 4 AND doc_id % 10 NOT IN (3, 7)
           AND doc_id % 100 <> 2),
       adm AS (SELECT s.doc_id, s.toks$dom
         FROM blk b JOIN st s ON s.doc_id = b.doc_id
         WHERE NOT b.blocked AND b.host IS NOT NULL
           AND s.toks >= 20 AND s.stops * 100 >= s.toks * 2),
       ek AS (SELECT min(d.doc_id) AS doc_id
         FROM adm a JOIN documents d ON d.doc_id = a.doc_id
         GROUP BY md5(d.text)),
       w AS (SELECT d.doc_id, unnest(string_split(d.text, ' ')) AS word,
           generate_subscripts(string_split(d.text, ' '), 1) AS pos
         FROM documents d JOIN ek ON ek.doc_id = d.doc_id),
       t AS (SELECT a.doc_id, a.word||' '||b.word||' '||c2.word AS sh
         FROM w a JOIN w b ON a.doc_id=b.doc_id AND b.pos=a.pos+1
                  JOIN w c2 ON a.doc_id=c2.doc_id AND c2.pos=a.pos+2),
       dd AS (SELECT DISTINCT doc_id, sh FROM t),
       sz AS (SELECT doc_id, count(*) n FROM dd GROUP BY 1),
       com AS (SELECT x.doc_id a, y.doc_id b, count(*) c
         FROM dd x JOIN dd y ON x.sh=y.sh AND x.doc_id<y.doc_id
         GROUP BY 1, 2),
       prs AS (SELECT a, b FROM com
         JOIN sz sa ON sa.doc_id=a JOIN sz sb ON sb.doc_id=b
         WHERE c*1.0/(sa.n+sb.n-c) >= 0.8),
       edges AS (SELECT a, b FROM prs UNION SELECT b, a FROM prs),
       nodes AS (SELECT DISTINCT a AS node FROM edges),
       walk(node, r) AS (
         SELECT node, node FROM nodes
         UNION
         SELECT wk.node, e.b FROM walk wk JOIN edges e ON e.a = wk.r),
       ccd AS (SELECT node AS doc_id, min(r) AS rep FROM walk
         GROUP BY node),
       nd AS (SELECT doc_id FROM ccd WHERE rep <> doc_id)"""
  }

  /** Shared oracle fragment: survivor set → release clean set — the
    * benchmark exclusion (`doc_id % 50 <> 0` inside `kept`, which
    * carries `toks` so downstream arithmetic needs no extra join) and
    * q54's any-shared-5-gram decontamination against the benchmark
    * split, ending at `clean(doc_id, toks)`. Composed into the
    * q166/q168 oracles so the release definition is written once.
    * Expects [[crawlSurvivorCte]] ahead of it. */
  /** Shared oracle fragment: the survivor set itself —
    * `kept(doc_id, toks)`, exact keepers that are near-dup
    * representatives — as composed by the q167/q170/q173/q174
    * oracles. ([[crawlCleanCte]] inlines its own benchmark-filtered
    * variant.) Expects [[crawlSurvivorCte]] ahead of it. */
  /** Shared oracle fragment: each survivor with its q30-predicted
    * language — the scoring route q173/q174 share. Expects
    * [[crawlKeptCte]] and [[TextAnalysis.langIdCte]] ahead of it. */
  private def crawlKscCte: String =
    s"""ksc AS (SELECT k.doc_id, l.pred_lang
         FROM kept k JOIN lg l ON l.doc_id = k.doc_id)"""

  private def crawlKeptCte: String =
    s"""kept AS (SELECT a.doc_id, a.toks FROM adm a
         JOIN ek ON ek.doc_id = a.doc_id
         LEFT JOIN nd ON nd.doc_id = a.doc_id
         WHERE nd.doc_id IS NULL)"""

  private def crawlCleanCte: String =
    s"""kept AS (SELECT a.doc_id, a.toks FROM adm a
         JOIN ek ON ek.doc_id = a.doc_id
         LEFT JOIN nd ON nd.doc_id = a.doc_id
         WHERE nd.doc_id IS NULL AND a.doc_id % 50 <> 0),
       pool AS (SELECT doc_id FROM kept
         UNION ALL
         SELECT doc_id FROM documents WHERE doc_id % 50 = 0),
       gw AS (SELECT d.doc_id, string_split(d.text, ' ') AS ws
         FROM documents d JOIN pool p ON p.doc_id = d.doc_id),
       gi AS (SELECT doc_id, ws,
           unnest(generate_series(1, greatest(len(ws)-4, 0))) AS i
         FROM gw),
       g5 AS (SELECT DISTINCT doc_id,
           array_to_string(ws[i:i+4], ' ') AS sh5 FROM gi),
       bg AS (SELECT DISTINCT sh5 FROM g5 WHERE doc_id % 50 = 0),
       cont AS (SELECT DISTINCT g5.doc_id FROM g5 JOIN bg USING (sh5)
         WHERE g5.doc_id % 50 <> 0),
       clean AS (SELECT k.doc_id, k.toks FROM kept k
         LEFT JOIN cont ON cont.doc_id = k.doc_id
         WHERE cont.doc_id IS NULL)"""

  /** Oracle for q165 [[crawlDedup]] — the q162 admission CTEs, exact
    * keep-min over the admitted texts, the q23 pair derivation
    * RESTRICTED to the exact keepers (the pairwise-Jaccard identity
    * the Spark side exploits via the shared index), and the q48
    * recursive transitive closure for representative selection. */
  lazy val crawlDedupOracle: String =
    s"""WITH RECURSIVE ${UrlCurate.curateCte},
       ${crawlSurvivorCte(withDomain = true)}
       SELECT a.domain,
         CAST(count(*) AS BIGINT) AS n_admitted,
         CAST(sum(CASE WHEN ek.doc_id IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_exact_unique,
         CAST(sum(CASE WHEN ek.doc_id IS NOT NULL AND nd.doc_id IS NULL
           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(sum(CASE WHEN ek.doc_id IS NOT NULL AND nd.doc_id IS NULL
           THEN a.toks ELSE 0 END) AS BIGINT) AS tok_kept
       FROM adm a
         LEFT JOIN ek ON ek.doc_id = a.doc_id
         LEFT JOIN nd ON nd.doc_id = a.doc_id
       GROUP BY a.domain ORDER BY a.domain"""

  /** The complete crawl-front RELEASE — q166, the last composition the
    * refinery needs: the dedup survivor set ([[crawlKeptOf]]) loses
    * benchmark members and benchmark-contaminated documents (q54's
    * any-shared-5-gram rule against the house benchmark split, doc_id
    * % 50 = 0), and what remains is laid out as the q143 DetMix shard
    * manifest. Raw archives to a decontaminated, deduplicated,
    * quality-gated training release in one oracled query — the full
    * CCNet/RefinedWeb/FineWeb path.
    *
    * `bench` = the benchmark documents (doc_id, text); they are
    * EXCLUDED from the release themselves (eval text must never ship)
    * and their distinct 5-grams broadcast as the contamination probe.
    *
    * Scale: survivors and the benchmark are disjoint by construction
    * (the % 50 filter precedes the union), so the decontamination
    * stage is q54's broadcast-gram join — gram explosion stays narrow,
    * only the tiny benchmark gram set ships to every executor; the
    * manifest is one hash aggregate on shard_id. */
  def crawlReleaseOf(admitted: DataFrame, pairs: DataFrame,
      bench: DataFrame): DataFrame =
    releaseFromKept(crawlKeptOf(admitted, pairs), bench)

  private def releaseFromKept(keptIn: DataFrame,
      bench: DataFrame): DataFrame =
    Shards.manifestOf(Shards.shardAssignOf(cleanFromKept(keptIn, bench)))

  /** The released document set itself (doc_id, text): survivors minus
    * benchmark members minus contaminated. q166 lays it out; q168
    * scores it. */
  private def cleanFromKept(keptIn: DataFrame,
      bench: DataFrame): DataFrame = {
    val kept = keptIn
      .filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), col("text"))
    val pool = kept.unionByName(bench.select(col("doc_id"), col("text")))
    val contaminated = Curate.decontaminateOf(pool).select(col("doc_id"))
    kept.join(contaminated, Seq("doc_id"), "left_anti")
  }

  private def benchDocs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), col("text"))

  /** The crawl front's released clean set, materialized once per
    * session — the third crawl memo, one stage downstream of
    * [[crawlFlags]]: the decontamination gram join runs once, and
    * q166's layout and q168's scorecard read the SAME release (two
    * separate derivations could not diverge, and q168 no longer
    * re-evaluates the gram join once per side of its self-join). */
  private[graft] def crawlClean(spark: SparkSession,
      dir: String): DataFrame =
    graft.SessionMemo(spark, s"crawl-clean:$dir") {
      cleanFromKept(keptFromFlags(crawlFlags(spark, dir)),
          benchDocs(spark, dir))
        .localCheckpoint()
    }

  /** q166: [[crawlReleaseOf]] over the crawl front — the session WET
    * memo, the session pair index, and the benchmark split of the
    * source corpus. ORDER BY = oracle determinism only. */
  def crawlRelease(spark: SparkSession, dir: String): DataFrame =
    Shards.manifestOf(Shards.shardAssignOf(crawlClean(spark, dir)))
      .orderBy(col("shard_id"))

  /** Oracle for q166 [[crawlRelease]] — the q165 survivor CTEs, q54's
    * string-5-gram contamination probe over survivors ∪ benchmark,
    * and the q143 manifest arithmetic over the clean set. */
  lazy val crawlReleaseOracle: String =
    s"""WITH RECURSIVE ${UrlCurate.curateCte},
       ${crawlSurvivorCte(withDomain = false)},
       $crawlCleanCte,
       asg AS (SELECT c3.doc_id, c3.toks AS n_tokens,
           CAST(${graft.functions.DetMix.mixSql("c3.doc_id", Shards.Seed)}
             % ${Shards.NShards} AS INT) AS shard_id,
           ${graft.functions.DetMix.mixSql("c3.doc_id", Shards.Seed + 1)}
             AS fp
         FROM clean c3)
       SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
         CAST(sum(fp) AS BIGINT) AS checksum
       FROM asg GROUP BY shard_id ORDER BY shard_id"""

  /** Per-language accounting of the dedup survivor corpus — q167, the
    * CCNet split: every language-partitioned curation pipeline buckets
    * the deduped corpus by PREDICTED language before per-language
    * quality filtering, and publishes how far the predictor agrees
    * with upstream labels. Per predicted language: surviving docs,
    * surviving token mass, and the count where the q30 trigram
    * prediction matches the source label.
    *
    * `kept` = the survivor frame (doc_id, …, text, _toks); `labels` =
    * (doc_id, lang) source labels. Language ID is q30's narrow
    * single-pass trigram scorer — no shuffle until the final
    * language aggregate (the label join is id-keyed). */
  def crawlLanguagesOf(kept: DataFrame, labels: DataFrame): DataFrame =
    languageRollupOf(
      TextAnalysis.langIdOf(
          kept.select(col("doc_id"), col("text"))
            .join(labels.select(col("doc_id"), col("lang")), Seq("doc_id")))
        .join(kept.select(col("doc_id"), col("_toks")), Seq("doc_id")))

  /** The q167 per-language rollup over any
    * (pred_lang, labeled_lang, _toks) frame — one definition shared by
    * the composable Of form and the memo-reading registered entry. */
  private def languageRollupOf(kl: DataFrame): DataFrame =
    kl.groupBy(col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_toks")).as("tok_kept"),
        sum(when(col("labeled_lang") === col("pred_lang"), 1L)
          .otherwise(0L)).as("n_label_agree"))

  /** q30 predictions (+ source labels) for every crawl survivor,
    * materialized once per session — the fourth crawl memo, one stage
    * downstream of [[crawlFlags]]: q167's accounting, q170's bucket
    * split, and the q173/q174/q175 per-language routing all consume
    * the SAME prediction of the SAME static survivor set, so deriving
    * the trigram scan once per query was registration overhead, not
    * semantics (each oracle still replays the langId chain
    * independently). */
  private[graft] def survivorLangFor(spark: SparkSession,
      dir: String): DataFrame =
    graft.SessionMemo(spark, s"crawl-survivor-lang:$dir") {
      val kept = keptFromFlags(crawlFlags(spark, dir))
      TextAnalysis.langIdOf(
          kept.select(col("doc_id"), col("text"))
            .join(Tables(spark, dir, "documents")
              .select(col("doc_id"), col("lang")), Seq("doc_id")))
        .select(col("doc_id"), col("labeled_lang"), col("pred_lang"))
        .localCheckpoint()
    }

  /** q167: the per-language survivor rollup over the session's
    * survivor predictions ([[survivorLangFor]]). ORDER BY = oracle
    * determinism only. */
  def crawlLanguages(spark: SparkSession, dir: String): DataFrame =
    languageRollupOf(survivorLangFor(spark, dir)
        .join(keptFromFlags(crawlFlags(spark, dir))
          .select(col("doc_id"), col("_toks")), Seq("doc_id")))
      .orderBy(col("pred_lang"))

  /** Oracle for q167 [[crawlLanguages]] — the q165 survivor CTEs and
    * q30's language CTE ([[TextAnalysis.langIdCte]]) joined on the
    * survivor ids. */
  lazy val crawlLanguagesOracle: String =
    s"""WITH RECURSIVE ${UrlCurate.curateCte},
       ${crawlSurvivorCte(withDomain = false)},
       $crawlKeptCte,
       ${TextAnalysis.langIdCte}
       SELECT l.pred_lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(k.toks) AS BIGINT) AS tok_kept,
         CAST(sum(CASE WHEN l.labeled_lang = l.pred_lang
           THEN 1 ELSE 0 END) AS BIGINT) AS n_label_agree
       FROM kept k JOIN lg l ON l.doc_id = k.doc_id
       GROUP BY l.pred_lang ORDER BY pred_lang"""

  /** Model-gated release scorecard — q168: the released shards (q166's
    * clean set, q143's layout) scored by the TRAINED q160 classifier,
    * per shard: documents, how many the model would keep (margin ≥ 0 —
    * "looks like the reference corpus"), token mass, and the kept
    * token mass. This is the model-based filter at its production
    * position (CCNet applies the LM/classifier gate AFTER dedup and
    * decontamination, per language/shard) — and because the model is
    * the SAME session-memoized artifact q160/q161/q164 derive, the
    * scorecard is the published evidence of what that classifier
    * would do to the actual release.
    *
    * Scale: scoring is q160's shape — per-(doc, word) tf counts
    * joined to the BROADCAST vocabulary-sized weight table, one
    * per-doc aggregate; the scorecard is one hash aggregate on
    * shard_id of id-keyed longs. */
  def releaseScorecard(spark: SparkSession, dir: String): DataFrame = {
    val clean = crawlClean(spark, dir)
    val assigned = Shards.shardAssignOf(clean)
    val scored = TextAnalysis.nbScoreOf(clean,
      TextAnalysis.nbModelFor(spark, dir))
    assigned
      .join(scored.select(col("doc_id"), col("margin_micro")),
        Seq("doc_id"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("margin_micro") >= 0, 1L).otherwise(0L))
          .as("n_model_kept"),
        sum(col("n_tokens")).as("tok_total"),
        sum(when(col("margin_micro") >= 0, col("n_tokens"))
          .otherwise(0L)).as("tok_model_kept"))
      .orderBy(col("shard_id"))
  }

  /** Oracle for q168 [[releaseScorecard]] — the q166 clean-set CTEs,
    * the q160 NB chain (whose per-doc `scored` margins cover every
    * document), the q143 assignment arithmetic, and one shard
    * rollup. */
  lazy val releaseScorecardOracle: String =
    s"""WITH RECURSIVE ${UrlCurate.curateCte},
       ${crawlSurvivorCte(withDomain = false)},
       $crawlCleanCte,
       ${TextAnalysis.nbCte},
       asg AS (SELECT c3.doc_id, c3.toks AS n_tokens,
           CAST(${graft.functions.DetMix.mixSql("c3.doc_id", Shards.Seed)}
             % ${Shards.NShards} AS INT) AS shard_id
         FROM clean c3)
       SELECT a2.shard_id,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN s2.margin_micro >= 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_model_kept,
         CAST(sum(a2.n_tokens) AS BIGINT) AS tok_total,
         CAST(sum(CASE WHEN s2.margin_micro >= 0 THEN a2.n_tokens
           ELSE 0 END) AS BIGINT) AS tok_model_kept
       FROM asg a2 JOIN scored s2 ON s2.doc_id = a2.doc_id
       GROUP BY a2.shard_id ORDER BY a2.shard_id"""

  /** CCNet's head/middle/tail split — q170: the dedup survivor corpus
    * scored under the REFERENCE-trained bigram LM
    * ([[TextAnalysis.refLmModelFor]], the wiki-KenLM position), then
    * cut into perplexity terciles WITHIN each predicted language (the
    * exact CCNet mechanic: per-language cutoffs, because perplexity
    * scales differ across languages), reported per (language, bucket)
    * as docs + token mass. `head` = most reference-like third.
    *
    * Ordering is (avg_logprob DESC, doc_id) — the score is DetLn
    * fix4-quantized and engine-exact, and the id tiebreak makes the
    * tercile assignment fully deterministic, so the oracle's ntile(3)
    * replays it bit-for-bit.
    *
    * Scale: perplexity is [[TextAnalysis.refPerplexityOf]]'s
    * broadcast-model scoring; language ID is the narrow q30 scorer;
    * the tercile cut is [[graft.ops.RankBands.ntileOf]] — exact
    * per-language rank cutoffs via the two-phase histogram bracket,
    * ntile-identical output with NO per-language global sort (CCNet's
    * own posture: it computes per-language cutoffs, it never sorts
    * each language through one reducer); the rollup is a tiny hash
    * aggregate. */
  def ccnetBucketsOf(kept: DataFrame, labels: DataFrame,
      model: TextAnalysis.RefLmModel): DataFrame =
    ccnetRollupOf(ccnetScoresOf(kept,
      TextAnalysis.langIdOf(
          kept.select(col("doc_id"), col("text"))
            .join(labels.select(col("doc_id"), col("lang")),
              Seq("doc_id"))),
      TextAnalysis.refPerplexityOf(
        kept.select(col("doc_id"), col("text")), model)))

  /** The (doc_id, _toks, pred_lang, _alp_i) tercile input: survivor
    * token mass, predicted language, and the fix4 score recovered as
    * an exact BIGINT in 1e-4 units (avg_logprob IS B/1e4 for integral
    * B, so round(·1e4) is exact — the integral key RankBands
    * brackets). */
  private def ccnetScoresOf(kept: DataFrame, lang: DataFrame,
      ppl: DataFrame): DataFrame =
    kept.select(col("doc_id"), col("_toks"))
      .join(ppl.select(col("doc_id"), col("avg_logprob")), Seq("doc_id"))
      .join(lang.select(col("doc_id"), col("pred_lang")), Seq("doc_id"))
      .withColumn("_alp_i",
        expr("CAST(round(avg_logprob * 1e4) AS BIGINT)"))

  /** Head/middle/tail per predicted language over a tercile-input
    * frame — the shared q170/q174 mechanic: [[graft.ops.RankBands]]'
    * exact cutoffs instead of a per-language ntile sort (the operator
    * materializes its input itself). */
  private[graft] def ccnetRollupOf(scores: DataFrame): DataFrame =
    graft.ops.RankBands.ntileOf(scores, 3,
        "pred_lang", "_alp_i", "doc_id", "_nt")
      .withColumn("bucket",
        when(col("_nt") === 1, "head")
          .when(col("_nt") === 2, "middle")
          .otherwise("tail"))
      .groupBy(col("pred_lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_toks")).as("tok_kept"))

  /** q170: the tercile rollup over the crawl front's survivor flags,
    * the session's survivor predictions ([[survivorLangFor]]), and the
    * session LM. ORDER BY = oracle determinism only. */
  def ccnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    val kept = keptFromFlags(crawlFlags(spark, dir))
    ccnetRollupOf(ccnetScoresOf(kept, survivorLangFor(spark, dir),
        TextAnalysis.refPerplexityOf(
          kept.select(col("doc_id"), col("text")),
          TextAnalysis.refLmModelFor(spark, dir))))
      .orderBy(col("pred_lang"), col("bucket"))
  }

  /** Oracle for q170 [[ccnetBuckets]] — the q165 survivor CTEs, the
    * reference-LM chain ([[TextAnalysis.refLmCte]]) scoring the
    * survivors, q30's language CTE, and the tercile window. */
  lazy val ccnetBucketsOracle: String =
    s"""WITH RECURSIVE ${UrlCurate.curateCte},
       ${crawlSurvivorCte(withDomain = false)},
       $crawlKeptCte,
       ${TextAnalysis.refLmCte("kept")},
       ${TextAnalysis.langIdCte},
       csc AS (SELECT k.doc_id, k.toks, l.pred_lang,
           ${graft.functions.DetLn.avg4Sql("p.sum_lp_micro",
             "p.n_transitions")} AS alp
         FROM kept k JOIN rlppl p ON p.doc_id = k.doc_id
         JOIN lg l ON l.doc_id = k.doc_id),
       cbk AS (SELECT pred_lang, toks,
           ntile(3) OVER (PARTITION BY pred_lang
             ORDER BY alp DESC, doc_id) AS nt
         FROM csc)
       SELECT pred_lang,
         CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
           ELSE 'tail' END AS bucket,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(toks) AS BIGINT) AS tok_kept
       FROM cbk GROUP BY 1, 2 ORDER BY pred_lang, bucket"""

  /** Per-language reference perplexity — q173: each crawl survivor
    * scored under the LM of its PREDICTED language
    * ([[TextAnalysis.langPerplexityOf]] over [[TextAnalysis
    * .langLmModelFor]]'s per-language models, q30's predictions) —
    * CCNet's production wiring: trusted labels train one model per
    * language, predictions route each document to its model, and a
    * document predicted a language the reference cannot model is
    * refused rather than scored under a foreign LM. ORDER BY = oracle
    * determinism only. */
  def langPerplexity(spark: SparkSession, dir: String): DataFrame =
    survivorLangPpl(spark, dir)._3
      .orderBy(col("doc_id"))

  /** Survivors scored under the per-language session models — ONE
    * definition of the routing (q30 predictions over the corpus
    * labels, refusal on unmodeled languages) shared by q173's per-doc
    * output, q174's tercile rollup, and q175's fallback route, so
    * none can diverge. Returns (kept survivors, predictions, per-doc
    * scores); sort-free. */
  private def survivorLangPpl(spark: SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame) = {
    val kept = keptFromFlags(crawlFlags(spark, dir))
    val lang = survivorLangFor(spark, dir)
      .select(col("doc_id"), col("pred_lang"))
    val ppl = TextAnalysis.langPerplexityOf(
      kept.select(col("doc_id"), col("text")).join(lang, Seq("doc_id")),
      TextAnalysis.langLmModelFor(spark, dir))
    (kept, lang, ppl)
  }

  /** The per-language survivor scores as a session artifact — the
    * [[Curate.neardupPairs]] convention applied to the LM stack: q173
    * (whose registered output IS these scores) derives them fresh,
    * while the COMPOSITIONS over them — q174's tercile rollup, q175's
    * routed fallback — read the one materialization. Results are
    * identical either way (the scoring chain is deterministic and the
    * oracles replay it end to end); only the re-derivation cost
    * collapses. */
  private[graft] def survivorLangPplFor(spark: SparkSession,
      dir: String): DataFrame =
    graft.SessionMemo(spark, s"crawl-survivor-langppl:$dir") {
      survivorLangPpl(spark, dir)._3.localCheckpoint()
    }

  /** Routed perplexity — q175, the fallback q173's refusal demands:
    * every survivor scored exactly once, under its predicted
    * language's LM when the reference models it (`model_kind` =
    * 'lang'), otherwise under the MIXED reference model (q169's, the
    * honest fallback — all reference mass rather than a wrong
    * language's counts), with the provenance column saying which.
    * Refuse-then-route: no document is lost, and no document's score
    * silently comes from a model that never saw its language family's
    * statistics. ORDER BY = oracle determinism only. */
  def routedPerplexity(spark: SparkSession, dir: String): DataFrame = {
    val kept = keptFromFlags(crawlFlags(spark, dir))
    val lang = survivorLangFor(spark, dir)
      .select(col("doc_id"), col("pred_lang"))
    val ppl = survivorLangPplFor(spark, dir)
    // route on membership in the (tiny, broadcast) modeled-language
    // set, NOT by anti-joining ppl's doc_ids: Spark does not dedup
    // common subtrees, so the ppl form would re-run the whole
    // per-language scoring chain once per side of the union.
    // Score-equivalent: langPerplexityOf's inner scal join means
    // "scored" ≡ "pred_lang ∈ scal" for every survivor (all clear the
    // ≥ 20-token admission gate, so none lack a transition).
    val modeledLangs = TextAnalysis.langLmModelFor(spark, dir)
      .scal.select(col("lang").as("pred_lang"))
    val unmodeled = kept.select(col("doc_id"), col("text"))
      .join(lang, Seq("doc_id"))
      .join(broadcast(modeledLangs), Seq("pred_lang"), "left_anti")
      .select(col("doc_id"), col("text"))
    val mixed = TextAnalysis.refPerplexityOf(unmodeled,
        TextAnalysis.refLmModelFor(spark, dir))
      .join(lang, Seq("doc_id"))
      .select(col("doc_id"), col("pred_lang"), col("n_transitions"),
        col("sum_lp_micro"), col("avg_logprob"))
    ppl.withColumn("model_kind", lit("lang"))
      .unionByName(mixed.withColumn("model_kind", lit("mixed")))
      .orderBy(col("doc_id"))
  }

  /** Oracle for q175 [[routedPerplexity]] — the q173 chain, the
    * unscored remainder, and the q169 chain over that remainder; the
    * `rl`/`ll` fragments compose under one WITH. */
  lazy val routedPerplexityOracle: String =
    s"""WITH RECURSIVE ${UrlCurate.curateCte},
       ${crawlSurvivorCte(withDomain = false)},
       $crawlKeptCte,
       ${TextAnalysis.langIdCte},
       $crawlKscCte,
       ${TextAnalysis.langLmCte("ksc")},
       mdoc AS (SELECT s.doc_id FROM ksc s
         LEFT JOIN llppl p ON p.doc_id = s.doc_id
         WHERE p.doc_id IS NULL),
       ${TextAnalysis.refLmCte("mdoc")}
       SELECT doc_id, pred_lang, n_transitions, sum_lp_micro,
         ${graft.functions.DetLn.avg4Sql("sum_lp_micro",
           "n_transitions")} AS avg_logprob,
         'lang' AS model_kind
       FROM llppl
       UNION ALL
       SELECT r.doc_id, s.pred_lang, r.n_transitions, r.sum_lp_micro,
         ${graft.functions.DetLn.avg4Sql("r.sum_lp_micro",
           "r.n_transitions")} AS avg_logprob,
         'mixed' AS model_kind
       FROM rlppl r JOIN ksc s ON s.doc_id = r.doc_id
       ORDER BY doc_id"""

  /** Oracle for q173 [[langPerplexity]] — the q165 survivor CTEs,
    * q30's language CTE routing each survivor, and the per-language
    * LM chain ([[TextAnalysis.langLmCte]]). */
  lazy val langPerplexityOracle: String =
    s"""WITH RECURSIVE ${UrlCurate.curateCte},
       ${crawlSurvivorCte(withDomain = false)},
       $crawlKeptCte,
       ${TextAnalysis.langIdCte},
       $crawlKscCte,
       ${TextAnalysis.langLmCte("ksc")}
       SELECT doc_id, pred_lang, n_transitions, sum_lp_micro,
         ${graft.functions.DetLn.avg4Sql("sum_lp_micro",
           "n_transitions")} AS avg_logprob
       FROM llppl ORDER BY doc_id"""

  /** CCNet terciles under the per-language models — q174: q170's
    * head/middle/tail mechanic with each survivor scored by ITS
    * predicted language's LM (q173) instead of the mixed-reference
    * model — the full CCNet stack (per-language models, per-language
    * cutoffs). Survivors whose predicted language the reference
    * cannot model are refused upstream and so carry no bucket — the
    * honest output for a pipeline that routes them elsewhere. The
    * tercile cut is q170's [[graft.ops.RankBands]] mechanic — exact
    * per-language cutoffs, no per-language sort. ORDER BY = oracle
    * determinism only. */
  def ccnetLangBuckets(spark: SparkSession, dir: String): DataFrame = {
    val kept = keptFromFlags(crawlFlags(spark, dir))
    val ppl = survivorLangPplFor(spark, dir)
    ccnetRollupOf(ccnetScoresOf(kept,
        ppl.select(col("doc_id"), col("pred_lang")), ppl))
      .orderBy(col("pred_lang"), col("bucket"))
  }

  /** Oracle for q174 [[ccnetLangBuckets]] — the q173 chain plus the
    * q170 tercile window. */
  lazy val ccnetLangBucketsOracle: String =
    s"""WITH RECURSIVE ${UrlCurate.curateCte},
       ${crawlSurvivorCte(withDomain = false)},
       $crawlKeptCte,
       ${TextAnalysis.langIdCte},
       $crawlKscCte,
       ${TextAnalysis.langLmCte("ksc")},
       csc AS (SELECT k.doc_id, k.toks, p.pred_lang,
           ${graft.functions.DetLn.avg4Sql("p.sum_lp_micro",
             "p.n_transitions")} AS alp
         FROM kept k JOIN llppl p ON p.doc_id = k.doc_id),
       cbk AS (SELECT pred_lang, toks,
           ntile(3) OVER (PARTITION BY pred_lang
             ORDER BY alp DESC, doc_id) AS nt
         FROM csc)
       SELECT pred_lang,
         CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
           ELSE 'tail' END AS bucket,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(toks) AS BIGINT) AS tok_kept
       FROM cbk GROUP BY 1, 2 ORDER BY pred_lang, bucket"""

  /** q171: the concat-and-chunk token layout of the released clean
    * set ([[Shards.tokenLayoutOf]] over the q166 shards) — the final
    * delivery answer: how many fixed-length training sequences each
    * released shard yields, how many documents straddle a sequence
    * boundary, and the padding the tail sequence carries. ORDER BY =
    * oracle determinism only. */
  def crawlTokenLayout(spark: SparkSession, dir: String): DataFrame =
    Shards.tokenLayoutOf(Shards.shardAssignOf(crawlClean(spark, dir)))
      .orderBy(col("shard_id"))

  /** Shared oracle fragment for q171/q172 — ONE SQL definition of the
    * deterministic layout ([[Shards.sequenceIndexOf]]'s
    * `withLayoutOffsets` twin): the q143 assignment arithmetic plus
    * the seed+2 order draw over the release clean set, and the
    * per-shard cumulative-sum window, ending at
    * `sp(shard_id, doc_id, n_tokens, s, e)`. The clean set's toks are
    * ≥ 20 by admission, so the Spark side's zero-token exclusion has
    * nothing to match here. Expects [[crawlCleanCte]] ahead of it. */
  private def crawlLayoutCte: String =
    s"""asg AS (SELECT c3.doc_id, c3.toks AS n_tokens,
           CAST(${graft.functions.DetMix.mixSql("c3.doc_id", Shards.Seed)}
             % ${Shards.NShards} AS INT) AS shard_id,
           ${graft.functions.DetMix.mixSql("c3.doc_id", Shards.Seed + 2)}
             AS ord
         FROM clean c3),
       cum AS (SELECT shard_id, doc_id, n_tokens,
           sum(n_tokens) OVER (PARTITION BY shard_id
             ORDER BY ord, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
         FROM asg),
       sp AS (SELECT shard_id, doc_id, n_tokens, e,
           e - n_tokens AS s FROM cum)"""

  /** Oracle for q171 [[crawlTokenLayout]] — the q166 clean-set CTEs,
    * the shared layout window, and the chunk arithmetic. */
  lazy val crawlTokenLayoutOracle: String =
    s"""WITH RECURSIVE ${UrlCurate.curateCte},
       ${crawlSurvivorCte(withDomain = false)},
       $crawlCleanCte,
       $crawlLayoutCte
       SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         CAST((sum(n_tokens) + ${Shards.SeqLen - 1}) // ${Shards.SeqLen}
           AS BIGINT) AS n_seqs,
         CAST(sum(CASE WHEN s // ${Shards.SeqLen}
             <> (e - 1) // ${Shards.SeqLen} THEN 1 ELSE 0 END)
           AS BIGINT) AS n_boundary_docs,
         CAST(((sum(n_tokens) + ${Shards.SeqLen - 1}) // ${Shards.SeqLen})
           * ${Shards.SeqLen} - sum(n_tokens) AS BIGINT) AS pad_tokens
       FROM sp GROUP BY shard_id ORDER BY shard_id"""

  /** q172: the per-SEQUENCE loader index of the released clean set
    * ([[Shards.sequenceIndexOf]] over the q166 shards) — one level
    * finer than q171: for every fixed-length training sequence, the
    * contributing documents and filled tokens. ORDER BY = oracle
    * determinism only. */
  def crawlSequenceIndex(spark: SparkSession, dir: String): DataFrame =
    Shards.sequenceIndexOf(Shards.shardAssignOf(crawlClean(spark, dir)))
      .orderBy(col("shard_id"), col("seq_id"))

  /** Oracle for q172 [[crawlSequenceIndex]] — the q166 clean-set CTEs,
    * the shared layout window, then each doc unnested to the
    * sequences its span overlaps and one (shard, sequence) rollup. */
  lazy val crawlSequenceIndexOracle: String =
    s"""WITH RECURSIVE ${UrlCurate.curateCte},
       ${crawlSurvivorCte(withDomain = false)},
       $crawlCleanCte,
       $crawlLayoutCte,
       sq AS (SELECT shard_id, doc_id, s, e,
           unnest(generate_series(
             CAST(s // ${Shards.SeqLen} AS BIGINT),
             CAST((e - 1) // ${Shards.SeqLen} AS BIGINT))) AS seq_id
         FROM sp)
       SELECT shard_id, seq_id,
         CAST(count(*) AS BIGINT) AS n_docs,
         arg_min(doc_id, s) AS first_doc,
         arg_max(doc_id, s) AS last_doc,
         CAST(sum(least(e, (seq_id + 1) * ${Shards.SeqLen})
           - greatest(s, seq_id * ${Shards.SeqLen})) AS BIGINT)
           AS n_tokens
       FROM sq GROUP BY 1, 2 ORDER BY shard_id, seq_id"""
}
