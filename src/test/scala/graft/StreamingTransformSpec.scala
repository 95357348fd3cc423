package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.StreamingTransform
import graft.ext.{Boilerplate, Pii}

/** Stateless streaming stages (extract / metadata / PII scrub): stream
  * output equals the batch operator over the union of batches, replays
  * are idempotent, and the wiring works through a real MemoryStream. */
class StreamingTransformSpec extends SparkSpecBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-stx").toString

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def rows(dir: String, cols: String*): Set[Seq[Any]] =
    spark.read.parquet(dir).select(cols.map(col): _*)
      .collect().map(_.toSeq).toSet

  test("streaming PII scrub equals batch q125 over the union of " +
      "batches; replay (including an emptied batch) is idempotent") {
    val out = tmp()
    val b0 = Seq(0L -> "alpha beta", 5L -> "gamma")
    val b1 = Seq(6L -> "delta", 10L -> "epsilon zeta")
    def pii(b: Seq[(Long, String)]) = Pii.synthesizePiiOf(docs(b: _*))
    StreamingTransform.processBatch(pii(b0), 0L, out, Pii.piiScanOf)
    StreamingTransform.processBatch(pii(b1), 1L, out, Pii.piiScanOf)
    val want = Pii.piiScanOf(pii(b0 ++ b1)).collect()
      .map(_.toSeq).toSet
    val cols = Seq("doc_id", "n_phones", "n_card_candidates",
      "n_cards_valid", "text_redacted")
    assert(rows(out, cols: _*) == want)
    // the scrub actually redacted something in this fixture
    assert(rows(out, "text_redacted").exists(
      _.head.toString.contains("<PHONE>")))
    // replay batch 1: byte-identical outcome
    StreamingTransform.processBatch(pii(b1), 1L, out, Pii.piiScanOf)
    assert(rows(out, cols: _*) == want)
    // empty replay clears the partition instead of keeping stale rows
    StreamingTransform.processBatch(docs(), 1L, out, Pii.piiScanOf)
    assert(rows(out, "doc_id").map(_.head) == Set(0L, 5L))
  }

  test("streaming extract and metadata stages equal their batch " +
      "operators over the union of batches") {
    val (outE, outM) = (tmp(), tmp())
    val b0 = Seq(1L -> ((1 to 25).map(i => s"w$i").mkString(" ")))
    val b1 = Seq(2L -> "tiny doc", 3L -> ((1 to 40).map(i => s"v$i").mkString(" ")))
    def html(b: Seq[(Long, String)]) =
      Boilerplate.synthesizeOutlinedHtmlOf(docs(b: _*))
    for ((b, i) <- Seq(b0, b1).zipWithIndex) {
      StreamingTransform.processBatch(html(b), i.toLong, outE,
        Boilerplate.extractContentOf)
      StreamingTransform.processBatch(html(b), i.toLong, outM,
        Boilerplate.extractMetadataOf)
    }
    val wantE = Boilerplate.extractContentOf(html(b0 ++ b1))
      .collect().map(_.toSeq).toSet
    assert(rows(outE, "doc_id", "n_blocks", "n_chrome", "n_link_dense",
      "n_short", "n_content", "main_text") == wantE)
    val wantM = Boilerplate.extractMetadataOf(html(b0 ++ b1))
      .collect().map(_.toSeq).toSet
    assert(rows(outM, "doc_id", "title", "first_h1", "n_headings",
      "outline") == wantM)
  }

  test("streaming robots-policy stage equals batch q139 over the union " +
      "of batches, through a real MemoryStream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val out = tmp()
    // urls from the q139 synthesis over two disjoint doc_id ranges
    def urls(ids: Seq[Long]) = graft.ext.UrlCurate.synthesizeUrlsOf(
      ids.toDF("doc_id")).as[(Long, String)].collect().toSeq
    val b0 = urls(0L to 40L)
    val b1 = urls(41L to 90L)
    val input = MemoryStream[(Long, String)]
    val q = StreamingTransform.startRobotsPolicy(
      input.toDF().toDF("doc_id", "url"), out, checkpointDir = tmp())
    input.addData(b0: _*)
    q.processAllAvailable()
    input.addData(b1: _*)
    q.processAllAvailable()
    q.stop()
    val want = graft.ext.Robots.policyOf(
        (b0 ++ b1).toDF("doc_id", "url")).collect().map(_.toSeq).toSet
    assert(rows(out, "doc_id", "domain", "path", "allowed",
      "matched_len") == want)
    // the stream actually blocked something in this range
    assert(rows(out, "allowed").exists(_.head == false))
  }

  test("streaming WARC ingestion: segments landing on disk stream " +
      "through the real binaryFile file source (one file per trigger) " +
      "and parse to exactly the batch readWarcDir records; replay " +
      "(including an emptied batch) is idempotent") {
    import spark.implicits._
    import graft.ext.Warc
    val docs = Tables(spark, sf0001, "documents")
    val blobs = Warc.synthesizeWarcBlobsOf(docs)
      .as[(Long, Array[Byte])].collect().toSeq
    val dir = Files.createTempDirectory("graft-warcstream").toFile
    blobs.foreach { case (b, bytes) =>
      java.nio.file.Files.write(
        new java.io.File(dir, s"seg-$b.warc.gz").toPath, Warc.gzip(bytes))
    }
    val out = tmp()
    val q = StreamingTransform.startWarcRecords(
      Warc.readWarcStream(spark, dir.getAbsolutePath,
        maxFilesPerTrigger = 1),
      out, checkpointDir = tmp())
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(out)
    // one micro-batch per file — the trigger bound held
    assert(got.select("batch_id").distinct().count() == blobs.size.toLong)
    val cols = Seq("blob_id", "rec_idx", "warc_type", "record_id",
      "target_uri", "content_length", "http_status",
      "http_content_encoding", "error")
    val want = Warc.readWarcDir(spark, dir.getAbsolutePath).toDF()
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(want.nonEmpty && rows(out, cols: _*) == want)
    // replay one blob's batch: byte-identical outcome; empty replay
    // clears the partition instead of keeping stale rows
    val replayId = got.select(min("batch_id")).as[Long].head()
    // the file source picks its own file order — replay whatever blob
    // actually landed in that batch
    val rb = got.filter(col("batch_id") === replayId)
      .select("blob_id").as[Long].head()
    val rbytes = blobs.find(_._1 == rb).get._2
    StreamingTransform.processBatch(
      Seq((rb, rbytes)).toDF("blob_id", "payload"), replayId, out,
      b => Warc.recordsOf(b).toDF())
    assert(rows(out, cols: _*) == want)
    StreamingTransform.processBatch(
      Seq.empty[(Long, Array[Byte])].toDF("blob_id", "payload"),
      replayId, out, b => Warc.recordsOf(b).toDF())
    assert(rows(out, "blob_id").map(_.head) ==
      blobs.map(_._1).toSet - rb)
    dir.listFiles().foreach(_.delete()); dir.delete()
  }

  test("composed streaming front door: archive blobs to robots " +
      "verdicts (parse -> fetch gate -> q139 policy) equals the batch " +
      "composition over the union of batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.{Robots, Warc}
    val out = tmp()
    val docs = Tables(spark, sf0001, "documents")
    val blobs = Warc.synthesizeWarcBlobsOf(docs)
      .as[(Long, Array[Byte])].collect().toSeq
    val (b0, b1) = blobs.splitAt(blobs.size / 2)
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamingTransform.startWarcPolicy(
      input.toDF().toDF("blob_id", "payload"), out, checkpointDir = tmp())
    input.addData(b0: _*)
    q.processAllAvailable()
    input.addData(b1: _*)
    q.processAllAvailable()
    q.stop()
    val want = Robots.policyOf(Warc.fetchUrlsOf(
        blobs.toDF("blob_id", "payload"))).collect().map(_.toSeq).toSet
    assert(want.nonEmpty)
    assert(rows(out, "doc_id", "domain", "path", "allowed",
      "matched_len") == want)
  }

  test("streaming quality scoring equals batch q122 inference over the " +
      "union of batches with the same supplied weight table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.TextAnalysis
    val out = tmp()
    val docsAll = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    // the q122 stand-in weights, frozen once — the "trained model" side
    import graft.functions.ShingleHashes.shingle_hashes_md5
    val weights = docsAll
      .select(explode(shingle_hashes_md5(col("text"), 3)).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select(col("h"),
        (expr(graft.functions.DetMix.mixSql("h", 122)) % 2001 - 1000)
          .as("wt"))
      .localCheckpoint()
    val rowsAll = docsAll.as[(Long, String)].collect().toSeq
    val (b0, b1) = rowsAll.splitAt(rowsAll.size / 2)
    val input = MemoryStream[(Long, String)]
    val q = StreamingTransform.startQualityScore(
      input.toDF().toDF("doc_id", "text"), weights, out,
      checkpointDir = tmp())
    input.addData(b0: _*)
    q.processAllAvailable()
    input.addData(b1: _*)
    q.processAllAvailable()
    q.stop()
    val want = TextAnalysis.hashedLinearScoreOf(
        rowsAll.toDF("doc_id", "text"), weights)
      .collect().map(_.toSeq).toSet
    assert(want.nonEmpty)
    assert(rows(out, "doc_id", "n_features", "margin", "keep") == want)
    // the gate is live in this fixture: both outcomes occur
    assert(rows(out, "keep").map(_.head).size == 2)
  }

  test("streaming perplexity scoring equals batch q169 over the union " +
      "of batches with the same trained model, and replay is " +
      "idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.TextAnalysis
    val out = tmp()
    val model = TextAnalysis.refLmModelFor(spark, sf0001)
    val docsAll = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val rowsAll = docsAll.as[(Long, String)].collect().toSeq
    val (b0, b1) = rowsAll.splitAt(rowsAll.size / 2)
    val input = MemoryStream[(Long, String)]
    val q = StreamingTransform.startPerplexityScore(
      input.toDF().toDF("doc_id", "text"), model, out,
      checkpointDir = tmp())
    input.addData(b0: _*)
    q.processAllAvailable()
    input.addData(b1: _*)
    q.processAllAvailable()
    q.stop()
    val want = TextAnalysis.refPerplexityOf(docsAll, model)
      .collect().map(_.toSeq).toSet
    assert(want.nonEmpty)
    val got = () => rows(out, "doc_id", "n_transitions",
      "sum_lp_micro", "avg_logprob")
    assert(got() == want)
    // replaying a batch rewrites its partition byte-identically
    StreamingTransform.processBatch(docs(b1: _*), 1L, out,
      b => TextAnalysis.refPerplexityOf(b, model))
    assert(got() == want)
  }

  test("streaming decontamination equals batch q54 over the union of " +
      "batches; clean docs emit no row") {
    import graft.ext.Curate
    val out = tmp()
    // doc 0 and 50 are the benchmark (the q54 % 50 convention); doc 1
    // shares a full 5-gram with doc 0, doc 2 with doc 50 twice, doc 3
    // shares nothing
    val bench = docs(
      0L -> "the quick brown fox jumps over the lazy dog",
      50L -> "pack my box with five dozen liquor jugs")
    val b0 = Seq(
      1L -> "prefix the quick brown fox jumps suffix",
      3L -> "completely unrelated words in this document here")
    val b1 = Seq(
      2L -> "pack my box with five dozen and pack my box with five jugs")
    val benchGh = Curate.gramsOf(bench).select(col("gh")).distinct()
      .localCheckpoint()
    def step(b: Seq[(Long, String)], id: Long) =
      StreamingTransform.processBatch(docs(b: _*), id, out,
        d => Curate.contaminationOf(Curate.gramsOf(d), benchGh))
    step(b0, 0L); step(b1, 1L)
    val want = Curate.contaminationOf(
        Curate.gramsOf(docs((b0 ++ b1): _*)), benchGh)
      .collect().map(_.toSeq).toSet
    assert(rows(out, "doc_id", "n_shared") == want)
    // doc 1 flagged, doc 2 flagged with both gram occurrences counted,
    // doc 3 absent (no row ≠ a zero row — the batch contract)
    val got = rows(out, "doc_id", "n_shared")
      .map(s => s.head.asInstanceOf[Long] -> s(1).asInstanceOf[Long])
      .toMap
    assert(got.contains(1L) && got(2L) >= 2L && !got.contains(3L))
    // and the wrapper composes the same pieces through a real stream
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out2 = tmp()
    val q = StreamingTransform.startDecontaminate(
      input.toDF().toDF("doc_id", "text"), benchGh, out2, tmp())
    input.addData(b0 ++ b1)
    q.processAllAvailable(); q.stop()
    assert(rows(out2, "doc_id", "n_shared") == want)
  }

  test("streaming semantic decontamination equals batch q190 over the " +
      "union of batches; eval members emit no row") {
    import graft.ext.{IvfIndex, Similarity}
    val out = tmp()
    // the q190 index definition + eval artifact on the real fixture
    // corpus (the gate needs real vectors, not toy strings)
    val cents = IvfIndex.detCentroids(16, 64, 11L)
    val artifact = Similarity.semanticEvalArtifact(spark, sf0001)
    val all = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint()
    // two arbitrary batches covering the WHOLE corpus, eval members
    // included — the stage must drop them, not flag them
    val b0 = all.filter(col("vec_id") % 2 === 0)
    val b1 = all.filter(col("vec_id") % 2 =!= 0)
    def step(b: DataFrame, id: Long) =
      StreamingTransform.processBatch(b, id, out,
        d => Similarity.semanticFlagsOfBatch(d, cents, artifact))
    step(b0, 0L); step(b1, 1L)
    val want = Similarity.semanticDecontaminate(spark, sf0001)
      .collect().map(r => Seq[Any](r.getLong(0), r.getString(1),
        r.getLong(2))).toSet
    assert(rows(out, "vec_id", "benchmark", "n_sem") == want)
    assert(want.nonEmpty)
    // no eval member (vec_id % 50 = 0 in this fixture) appears
    assert(rows(out, "vec_id", "benchmark", "n_sem")
      .forall(_.head.asInstanceOf[Long] % 50 != 0))
  }

  test("streaming unigram tokenization equals batch encodeOf over the " +
      "union of batches with the same trained model") {
    import graft.ext.Unigram
    val out = tmp()
    val train = docs(
      100L -> "the cat sat on the mat the cat sat",
      101L -> "the dog sat on the mat the dog ran")
    val model = Unigram.trainModelOf(train)
    val b0 = Seq(1L -> "the cat ran", 2L -> "")
    val b1 = Seq(3L -> "mat dog mat")
    def step(b: Seq[(Long, String)], id: Long) =
      StreamingTransform.processBatch(docs(b: _*), id, out,
        d => Unigram.encodeOf(d, model))
    step(b0, 0L); step(b1, 1L)
    val want = Unigram.encodeOf(docs((b0 ++ b1): _*), model)
      .collect().map(_.toSeq).toSet
    assert(rows(out, "doc_id", "n_words", "n_pieces") == want)
    // the wrapper wires the same pieces
    val out2 = tmp()
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingTransform.startUnigramEncode(
      input.toDF().toDF("doc_id", "text"), model, out2, tmp())
    input.addData(b0 ++ b1)
    q.processAllAvailable(); q.stop()
    assert(rows(out2, "doc_id", "n_words", "n_pieces") == want)
  }

  test("end-to-end through writeStream: the PII stage scrubs across " +
      "real micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val out = tmp()
    val input = MemoryStream[(Long, String)]
    val q = StreamingTransform.startPiiScrub(
      Pii.synthesizePiiOf(input.toDF().toDF("doc_id", "text")),
      out, checkpointDir = tmp())
    input.addData(0L -> "first")
    q.processAllAvailable()
    input.addData(6L -> "second", 10L -> "third")
    q.processAllAvailable()
    q.stop()
    assert(rows(out, "doc_id").map(_.head) == Set(0L, 6L, 10L))
    // doc 0: phone (0%5) and valid card (0%3, even); doc 6: valid card
    val red = rows(out, "doc_id", "text_redacted")
      .map(s => s.head.asInstanceOf[Long] -> s(1).toString).toMap
    assert(red(0L).contains("<PHONE>") && red(0L).contains("<CARD>"))
    assert(red(6L).contains("<CARD>"))
    assert(!red(10L).contains("<CARD>"))
  }
}
