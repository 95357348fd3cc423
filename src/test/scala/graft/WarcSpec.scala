package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ext.{UrlCurate, Warc}
import graft.ext.Warc.WarcRecord

/** WARC ingestion (q153-q155): length-based framing goldens (a block
  * containing `WARC/1.0` bytes, LF-only line breaks, case-insensitive
  * and continued headers), gzip member-concatenated blobs, quarantine
  * rows for every malformed-framing class, HTTP envelope stripping,
  * writer→parser roundtrip (property), directory reads, the WET
  * derivation's zero-shuffle contract, and synthesis-twin equality
  * (scalar URL ≡ expression URL). */
class WarcSpec extends SparkSpecBase {

  private def check(prop: Prop, minTests: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  private def rec(headers: Seq[(String, String)],
      block: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    Warc.writeRecord(out, headers, block)
    out.toByteArray
  }

  private def resp(id: Long, body: String, code: Int = 200,
      reason: String = "OK"): Array[Byte] = {
    val payload = body.getBytes("UTF-8")
    val env = s"HTTP/1.1 $code $reason\r\nContent-Type: text/html\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n"
    rec(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:graft:doc:$id>",
      "WARC-Target-URI" -> s"https://x.com/$id",
      "WARC-Date" -> "2024-01-01T00:00:00Z",
      "Content-Type" -> "application/http;msgtype=response"),
      env.getBytes("ISO-8859-1") ++ payload)
  }

  test("framing is length-based: a body containing the bytes " +
      "'WARC/1.0\\r\\n' does not split a record") {
    val trap = "before WARC/1.0\r\nWARC-Type: fake\r\n\r\nafter"
    val blob = resp(1, trap) ++ resp(2, "second")
    val rs = Warc.parseBlob(7L, blob)
    assert(rs.length == 2)
    assert(rs.forall(_.error.isEmpty))
    assert(new String(rs(0).body, "UTF-8") == trap)
    assert(rs(1).record_id.contains("<urn:graft:doc:2>"))
    assert(rs.map(_.rec_idx) == Seq(0, 1))
    assert(rs.forall(_.blob_id == 7L))
  }

  test("LF-only records, case-mixed header names, and header value " +
      "continuation lines all parse") {
    val body = "payload"
    val lfRecord = ("WARC/1.1\n" +
      "warc-type: response\n" +
      "WARC-RECORD-ID: <urn:a>\n" +
      "WARC-Target-URI: https://x.com/a\n" +
      "  continued-tail\n" + // continuation joins previous value
      s"content-length: ${body.length}\n\n" +
      body + "\n\n").getBytes("ISO-8859-1")
    val rs = Warc.parseBlob(0L, lfRecord)
    assert(rs.length == 1)
    val r = rs.head
    assert(r.error.isEmpty)
    assert(r.warc_type.contains("response"))
    assert(r.record_id.contains("<urn:a>"))
    assert(r.target_uri.contains("https://x.com/a continued-tail"))
    // content-type absent -> no HTTP strip even though body is free-form
    assert(r.http_status.isEmpty)
    assert(new String(r.body, "UTF-8") == body)
  }

  test("HTTP envelope: status and content-type extracted, payload " +
      "stripped; LF-only envelopes parse; non-HTTP block under an " +
      "application/http label surfaces raw, not failed") {
    val lfEnv = "HTTP/1.0 404 Not Found\nContent-Type: a/b\n\nbody!"
    val r1 = Warc.parseBlob(0L, rec(Seq(
      "WARC-Type" -> "response",
      "Content-Type" -> "application/http"),
      lfEnv.getBytes("ISO-8859-1"))).head
    assert(r1.http_status.contains(404))
    assert(r1.http_content_type.contains("a/b"))
    assert(new String(r1.body, "UTF-8") == "body!")
    val r2 = Warc.parseBlob(0L, rec(Seq(
      "WARC-Type" -> "response",
      "Content-Type" -> "application/http"),
      "NOT-HTTP".getBytes("ISO-8859-1"))).head
    assert(r2.error.isEmpty && r2.http_status.isEmpty)
    assert(new String(r2.body, "UTF-8") == "NOT-HTTP")
  }

  private def encResp(enc: String, wire: Array[Byte]): Array[Byte] = {
    val env = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      s"Content-Encoding: $enc\r\nContent-Length: ${wire.length}\r\n\r\n"
    rec(Seq(
      "WARC-Type" -> "response",
      "Content-Type" -> "application/http;msgtype=response"),
      env.getBytes("ISO-8859-1") ++ wire)
  }

  test("Content-Encoding decode: hand-built gzip/zlib/raw-deflate wire " +
      "(the oracle-pinned n+23/n+11/n+5 stored-block forms) decode via " +
      "the independent JDK Inflater; header is case-insensitive") {
    val text = "compressed payload éü".getBytes("UTF-8")
    assert(Warc.gzipStored(text).length == text.length + 23)
    assert(Warc.zlibStored(text).length == text.length + 11)
    val cases = Seq(
      "gzip" -> Warc.gzipStored(text),
      "x-gzip" -> Warc.gzipStored(text),
      "GZIP" -> Warc.gzipStored(text),     // RFC 9110: codings case-insensitive
      "deflate" -> Warc.zlibStored(text),  // the RFC-correct zlib wrapper
      "identity" -> text)
    cases.foreach { case (enc, wire) =>
      val r = Warc.parseBlob(0L, encResp(enc, wire)).head
      assert(r.error.isEmpty, s"$enc: ${r.error}")
      assert(r.http_content_encoding.contains(enc))
      assert(r.http_wire_len.contains(wire.length.toLong))
      assert(java.util.Arrays.equals(r.body, text), enc)
    }
  }

  test("Content-Encoding faults are RECORD-level: corrupt gzip, an " +
      "unsupported coding, and raw-DEFLATE-under-'deflate' fallback — " +
      "body kept raw on fault, and the NEXT record still parses") {
    val text = "fallback payload".getBytes("UTF-8")
    // broken server: raw RFC 1951 stream named "deflate" -> fallback decodes
    val raw = Warc.parseBlob(0L,
      encResp("deflate", Warc.gzipStored(text).slice(10, 10 + text.length + 5))
    ).head
    assert(raw.error.isEmpty && java.util.Arrays.equals(raw.body, text))

    val corrupt = Warc.gzipStored(text); corrupt(3) = 0x7f // mangle FLG
    val blob = encResp("gzip", corrupt) ++ encResp("br", text) ++
      encResp("gzip", Warc.gzipStored(text))
    val rs = Warc.parseBlob(0L, blob)
    assert(rs.length == 3, rs.map(_.error).toString)
    assert(rs(0).error.exists(_.contains("gzip decode failed")))
    assert(java.util.Arrays.equals(rs(0).body, corrupt)) // raw, not lost
    assert(rs(1).error.contains("unsupported Content-Encoding: br"))
    assert(java.util.Arrays.equals(rs(1).body, text))
    assert(rs(2).error.isEmpty && java.util.Arrays.equals(rs(2).body, text))
  }

  test("inflate hostile-stream arms: FDICT (preset dictionary) is " +
      "refused instead of looped on, truncation throws, and a deflate " +
      "bomb hits the size cap — all catchable Exceptions") {
    val text = "x".getBytes("UTF-8")
    // zlib header with the FDICT bit: CMF 0x78, FLG 0x20 (bit 5 set,
    // (0x78*256+0x20) % 31 == 0), then a 4-byte dictionary id
    val fdict = Array[Byte](0x78, 0x20, 1, 2, 3, 4) ++
      Warc.zlibStored(text).drop(2)
    val e1 = intercept[java.util.zip.DataFormatException](
      Warc.inflate(fdict, raw = false))
    assert(e1.getMessage.contains("preset dictionary"))
    val e2 = intercept[java.util.zip.DataFormatException](
      Warc.inflate(Warc.zlibStored(text).dropRight(6), raw = false))
    assert(e2.getMessage.contains("truncated"))
    // a real deflate bomb: 4 MB of zeros compress to ~4 KB; the cap
    // stops inflation long before the buffer reaches the payload size
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(new Array[Byte](4 << 20)); deflater.finish()
    val bomb = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished())
      bomb.write(buf, 0, deflater.deflate(buf))
    assert(bomb.size() < 8192)
    val e3 = intercept[RuntimeException](
      Warc.inflate(bomb.toByteArray, raw = false, limit = 65536))
    assert(e3.getMessage.contains("exceeds 65536"))
  }

  test("blob-level inflate faults quarantine, never crash: corrupt " +
      ".warc.gz bytes and an inflated-size cap breach each yield one " +
      "error row") {
    val good = resp(1, "payload")
    val gz = Warc.gzip(good)
    gz(gz.length / 2) = (gz(gz.length / 2) ^ 0x55).toByte // corrupt body
    val rs1 = Warc.parseBlob(3L, gz)
    assert(rs1.length == 1 &&
      rs1.head.error.exists(_.contains("blob inflate failed")))
    // cap breach: inflate refuses past the limit instead of buffering
    val big = Warc.gzip(Array.fill(1 << 16)('a'.toByte))
    val ex = intercept[RuntimeException](Warc.gunzip(big, limit = 1024))
    assert(ex.getMessage.contains("exceeds 1024"))
  }

  test("quarantine rows: bad version line, missing Content-Length, " +
      "truncated block — parsed prefix stands, one error row, stop") {
    val good = resp(1, "ok-record")
    val badVersion = good ++ "HTTP/1.1 200 OK\r\n\r\n".getBytes("ISO-8859-1")
    val rs1 = Warc.parseBlob(0L, badVersion)
    assert(rs1.length == 2 && rs1(0).error.isEmpty)
    assert(rs1(1).error.exists(_.contains("bad version line")))

    val noLen = good ++ rec(Seq("WARC-Type" -> "response"), Array[Byte]())
      .map(identity) // keep bytes
    // strip the writer's Content-Length header to synthesize the fault
    val noLenBytes = new String(noLen, "ISO-8859-1")
      .replace("Content-Length: 0\r\n", "").getBytes("ISO-8859-1")
    val rs2 = Warc.parseBlob(0L, noLenBytes)
    assert(rs2.length == 2)
    assert(rs2(1).error.exists(_.contains("Content-Length")))

    val truncated = good ++ resp(2, "x" * 100).dropRight(60)
    val rs3 = Warc.parseBlob(0L, truncated)
    assert(rs3.length == 2)
    assert(rs3(1).error.exists(_.contains("truncated")))

    // Try(v.toLong) parses "-5": a negative declared length must land in
    // quarantine, not in copyOfRange (which throws and kills the task)
    val negLen = good ++ new String(
      rec(Seq("WARC-Type" -> "response"), Array[Byte]()), "ISO-8859-1")
      .replace("Content-Length: 0\r\n", "Content-Length: -5\r\n")
      .getBytes("ISO-8859-1")
    val rs4 = Warc.parseBlob(0L, negLen)
    assert(rs4.length == 2 && rs4(0).error.isEmpty)
    assert(rs4(1).error.exists(_.contains("negative Content-Length")))
  }

  test("gzip: member-concatenated .warc.gz (one member per record) " +
      "inflates and parses whole; single-member roundtrips") {
    val blob = Warc.gzip(resp(1, "alpha")) ++ Warc.gzip(resp(2, "beta"))
    val rs = Warc.parseBlob(3L, blob)
    assert(rs.map(r => new String(r.body, "UTF-8")) == Seq("alpha", "beta"))
    val single = Warc.gzip(resp(9, "gamma"))
    assert(new String(Warc.parseBlob(0L, single).head.body,
      "UTF-8") == "gamma")
  }

  test("property: writer→parser roundtrip preserves headers and " +
      "arbitrary block bytes (incl. CR/LF/NUL) under CRLF framing") {
    val bytesGen = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)
    check(Prop.forAll(bytesGen, Gen.alphaNumStr.suchThat(_.nonEmpty)) {
      (block: Array[Byte], id: String) =>
        val one = rec(Seq(
          "WARC-Type" -> "metadata",
          "WARC-Record-ID" -> s"<urn:$id>"), block)
        val rs = Warc.parseBlob(0L, one ++ one)
        rs.length == 2 && rs.forall { r =>
          r.error.isEmpty && r.warc_type.contains("metadata") &&
            r.record_id.contains(s"<urn:$id>") &&
            java.util.Arrays.equals(r.body, block)
        }
    })
  }

  test("synthesis twin: UrlCurate.synthUrlScala ≡ synthUrlExpr over " +
      "the corpus (the WARC writer's JVM-side URL must be the oracle's)") {
    val docs = Tables(spark, sf001, "documents")
    val fromExpr = UrlCurate.synthesizeUrlsOf(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fromExpr.nonEmpty)
    fromExpr.foreach { case (id, url) =>
      assert(UrlCurate.synthUrlScala(id) == url, s"doc_id=$id")
    }
  }

  test("readWarcDir: files written to disk (.warc.gz) parse to exactly " +
      "the in-memory records, blob_id from the file name") {
    import spark.implicits._
    val docs = Tables(spark, sf0001, "documents")
    val blobs = Warc.synthesizeWarcBlobsOf(docs)
      .as[(Long, Array[Byte])].collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("warcspec").toFile
    blobs.foreach { case (b, bytes) =>
      java.nio.file.Files.write(
        new java.io.File(dir, s"seg-$b.warc.gz").toPath, Warc.gzip(bytes))
    }
    val fromDir = Warc.readWarcDir(spark, dir.getAbsolutePath)
      .collect().map(r => (r.blob_id, r.rec_idx) -> r).toMap
    val direct = blobs.flatMap { case (b, bytes) => Warc.parseBlob(b, bytes) }
    assert(direct.nonEmpty && fromDir.size == direct.size)
    direct.foreach { d =>
      val g = fromDir((d.blob_id, d.rec_idx))
      assert(g.record_id == d.record_id && g.warc_type == d.warc_type &&
        g.content_length == d.content_length &&
        java.util.Arrays.equals(g.body, d.body))
    }
    dir.listFiles().foreach(_.delete()); dir.delete()
  }

  test("fetch gate: only well-formed HTTP-200 responses pass; the " +
      "synthesized corpus exercises 200/301/404 and conversion records") {
    val records = Warc.recordsOf(Warc.synthesizeWarcBlobsOf(
      Tables(spark, sf001, "documents")))
    val all = records.collect()
    // the ONLY errors are the planted lying-`br` rows (id ≡ 2 mod 100) —
    // framing errors would also land here, so this pins both directions
    all.foreach { r =>
      val id = r.record_id.flatMap(
        "doc:(\\d+)".r.findFirstMatchIn(_)).map(_.group(1).toLong)
      if (id.exists(i => i % 100 == 2 && i % 5 != 4))
        assert(r.error.contains("unsupported Content-Encoding: br") &&
          r.http_content_encoding.contains("br"))
      else assert(r.error.isEmpty, s"unexpected error on $id: ${r.error}")
    }
    val statuses = all.flatMap(_.http_status).toSet
    assert(statuses == Set(200, 301, 404))
    assert(all.exists(_.warc_type.contains("conversion")))
    val ok = Warc.fetchOkOf(records).collect()
    assert(ok.nonEmpty)
    assert(ok.forall(r => r.warc_type.contains("response") &&
      r.http_status.contains(200)))
  }

  test("q162 crawl-to-corpus reconciles against q154: every domain's " +
      "fetched count equals the fetch gate's doc count, admitted <= " +
      "fetched, and one domain's gate recomputes doc-by-doc") {
    import spark.implicits._
    import graft.ext.Warc
    val corpus = Warc.crawlCorpus(spark, sf001).collect()
      .map(r => r.getAs[String]("domain") -> r).toMap
    val fetch = Warc.warcFetch(spark, sf001).collect()
      .map(r => r.getAs[String]("domain") -> r.getAs[Long]("n_docs")).toMap
    assert(corpus.nonEmpty && corpus.keySet == fetch.keySet)
    corpus.foreach { case (d, r) =>
      assert(r.getAs[Long]("n_fetched") == fetch(d), d)
      assert(r.getAs[Long]("n_admitted") <= r.getAs[Long]("n_fetched"), d)
    }
    // both gate outcomes occur somewhere (the quality gate is live)
    assert(corpus.values.exists(r =>
      r.getAs[Long]("n_admitted") < r.getAs[Long]("n_fetched")))
    assert(corpus.values.exists(r => r.getAs[Long]("n_admitted") > 0))
    // recompute the busiest domain from the WET text itself
    val (busiest, row) = corpus.maxBy(_._2.getAs[Long]("n_fetched"))
    val stops = graft.ext.TextAnalysis.stopwordList.toSet
    val wet = Warc.recordsOf(Warc.wetBlobsOf(Warc.recordsOf(
        Warc.synthesizeWarcBlobsOf(Tables(spark, sf001, "documents")))))
      .collect()
    val urls = graft.ext.UrlCurate.blocklistOf(
        graft.ext.UrlCurate.registrableDomainOf(
          graft.ext.UrlCurate.canonicalizeOf(
            wet.toSeq.map(_.target_uri.get).toDF("url"))))
      .collect()
      .map(r => r.getAs[String]("url") ->
        (Option(r.getAs[String]("registrable_domain"))
          .getOrElse(r.getAs[String]("host")))).toMap
    val mine = wet.filter(w => urls(w.target_uri.get) == busiest)
    assert(mine.length.toLong == row.getAs[Long]("n_fetched"))
    val admitted = mine.map(w => new String(w.body, "UTF-8"))
      .filter { t =>
        val toks = t.split(" ", -1)
        toks.length >= 20 &&
          toks.count(stops.contains) * 100 >= toks.length * 2
      }
    assert(admitted.length.toLong == row.getAs[Long]("n_admitted"))
  }

  test("q163 crawl-to-shards: the manifest over the WARC path equals " +
      "the manifest computed straight from the documents table's " +
      "admitted set — delivery is source-independent") {
    import graft.ext.{Shards, UrlCurate, Warc}
    import org.apache.spark.sql.functions.{array, array_contains, col,
      filter, lit, size, split}
    val got = Warc.crawlShards(spark, sf001).collect()
      .map(r => r.getAs[Int]("shard_id") -> r.toSeq).toMap
    // the admitted set rebuilt WITHOUT the WARC machinery: the fetch
    // gate is id arithmetic, the quality gate and blocklist ride the
    // same curate chain over the raw table
    val docs = Tables(spark, sf001, "documents")
      .filter(col("doc_id") % 5 =!= 4 &&
        !(col("doc_id") % 10).isin(3, 7) && col("doc_id") % 100 =!= 2)
    val urls = UrlCurate.blocklistOf(UrlCurate.registrableDomainOf(
      UrlCurate.canonicalizeOf(UrlCurate.synthesizeUrlsOf(docs))))
    val w = split(col("text"), " ")
    val stopArr = array(
      graft.ext.TextAnalysis.stopwordList.map(lit): _*)
    val admitted = docs
      .join(urls.filter(!col("blocked") && col("host").isNotNull)
        .select(col("doc_id")), Seq("doc_id"))
      .withColumn("_toks", size(w).cast("long"))
      .withColumn("_stops",
        size(filter(w, t => array_contains(stopArr, t))).cast("long"))
      .filter(col("_toks") >= 20 &&
        col("_stops") * 100 >= col("_toks") * 2)
      .select(col("doc_id"), col("text"))
    val want = Shards.manifestOf(Shards.shardAssignOf(admitted))
      .collect().map(r => r.getAs[Int]("shard_id") -> r.toSeq).toMap
    assert(want.nonEmpty && got == want)
  }

  test("plan shape: q162 and q163 each run on exactly TWO exchanges — " +
      "the synthesis groupByKey and the one final aggregate; " +
      "everything between (parse, WET, URL chain, gates) is narrow") {
    import graft.ext.Warc
    for ((name, df) <- Seq(
        "q162" -> Warc.crawlCorpus(spark, sf0001),
        "q163" -> Warc.crawlShards(spark, sf0001))) {
      val exchanges = df.queryExecution.executedPlan.toString()
        .linesIterator.count(_.contains("Exchange"))
      // the orderBy adds a range exchange on the tiny aggregated frame;
      // allow it, forbid anything more
      assert(exchanges <= 3, s"$name expected <= 3 exchanges " +
        s"(synthesis + aggregate + output sort), got $exchanges:\n" +
        df.queryExecution.executedPlan)
    }
  }

  test("WET derivation: zero shuffle from records to WET blobs (blob-" +
      "contiguous grouping, no Exchange), and the roundtrip preserves " +
      "payload bytes and lineage") {
    val docs = Tables(spark, sf0001, "documents")
    val records = Warc.recordsOf(Warc.synthesizeWarcBlobsOf(docs))
    val wet = Warc.wetBlobsOf(records)
    // plan: exactly the synthesis groupByKey exchange — WET adds none
    val exchanges = wet.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected only the synthesis exchange:\n" +
      wet.queryExecution.executedPlan)
    val back = Warc.recordsOf(wet).collect()
    assert(back.nonEmpty)
    assert(back.forall(r => r.warc_type.contains("conversion") &&
      r.error.isEmpty))
    val src = Warc.fetchOkOf(records).collect()
      .map(r => r.record_id.get -> r).toMap
    assert(back.length == src.size)
    back.foreach { w =>
      // WARC-Refers-To is parsed out of... headers map (not surfaced as a
      // column) — lineage is pinned via the wet:<id> record id instead
      val id = "wet:(\\d+)".r.findFirstMatchIn(w.record_id.get)
        .get.group(1)
      val s = src(s"<urn:graft:doc:$id>")
      assert(java.util.Arrays.equals(w.body, s.body))
      assert(w.target_uri == s.target_uri && w.warc_date == s.warc_date)
    }
  }
}
