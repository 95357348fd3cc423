package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ext.SftAssembly
import graft.streaming.StreamingSft

/** Streaming SFT turn accumulation: thread and release-card snapshots
  * equal the batch rollups over the union of batches, arrival order
  * is immaterial, re-delivered events supersede latest-wins, replays
  * (including emptied ones) are idempotent, and the empty/foreign
  * bootstrap contracts hold. */
class StreamingSftSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-ssft").toString

  private type Turn = (Long, Long, Long, String, Double)

  private def turnsDf(rows: Seq[Turn]) =
    rows.toDF("event_id", "user_id", "us", "event_type", "value")

  private def push(out: String, id: Long, rows: Seq[Turn]): Unit =
    StreamingSft.processBatch(turnsDf(rows), id, out)

  private def threadSnap(out: String) =
    StreamingSft.snapshotThreads(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getBoolean(4), r.getInt(5), r.getString(6))).toSet

  private def cardSnap(out: String) =
    StreamingSft.snapshotCard(spark, out).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet

  private def wantThreads(rows: Seq[Turn]) =
    SftAssembly.conversationThreadsOf(SftAssembly.turnColumnsOf(
        turnsDf(rows).select(col("user_id"), col("us"), col("event_id"),
          col("event_type"))))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getBoolean(4), r.getInt(5), r.getString(6))).toSet

  private def wantCard(rows: Seq[Turn]) =
    SftAssembly.releaseCardOf(
        SftAssembly.conversationThreadsOf(SftAssembly.turnColumnsOf(
          turnsDf(rows).select(col("user_id"), col("us"), col("event_id"),
            col("event_type")))),
        SftAssembly.preferencePairsOfEvents(
          turnsDf(rows).select(col("user_id"), col("event_id"),
            col("value"))))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet

  private val day = 86400000000L
  // user 1: a valid alternating day-0 thread (user first) + a day-1
  // violation thread; user 2: assistant-first day-0 thread. Rewards
  // spread so pairs are non-trivial.
  private val log: Seq[Turn] = Seq(
    (100L, 1L, 1000L, "click", 5.0),
    (101L, 1L, 2000L, "error", 9.0),
    (102L, 1L, 3000L, "view", 1.0),
    (103L, 1L, 4000L, "purchase", 7.0),
    (110L, 1L, day + 500L, "click", 2.0),
    (111L, 1L, day + 600L, "view", 8.0),
    (200L, 2L, 1500L, "error", 4.0),
    (201L, 2L, 2500L, "signup", 4.0),
    (202L, 2L, 3500L, "purchase", 4.0))

  test("streamed thread and card snapshots equal the batch rollups " +
      "over the union, both arrival orders") {
    val (a, b) = log.splitAt(4)
    val out1 = tmp()
    push(out1, 0L, a); push(out1, 1L, b)
    assert(threadSnap(out1) == wantThreads(log))
    assert(cardSnap(out1) == wantCard(log))
    val out2 = tmp()
    push(out2, 0L, b); push(out2, 1L, a)
    assert(threadSnap(out2) == wantThreads(log))
    assert(cardSnap(out2) == wantCard(log))
    assert(cardSnap(out1).nonEmpty)
  }

  test("q200 token-packing snapshot equals the batch core over the " +
      "union, and a late turn globally repacks (derived, never " +
      "accumulated)") {
    // token table: doc_id 0..4, weights chosen so threads straddle the
    // budget; modulus 5 maps event_ids onto it
    val toks = Seq((0L, 3L), (1L, 5L), (2L, 2L), (3L, 7L), (4L, 4L))
      .toDF("doc_id", "toks")
    val nDocs = 5L
    val budget = 8L
    def packSnap(out: String) =
      StreamingSft.snapshotTokenPacking(spark, out, toks, nDocs, budget)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
    def wantPack(rows: Seq[Turn]) = {
      val turnCols = SftAssembly.turnColumnsOf(
        turnsDf(rows).select(col("user_id"), col("us"), col("event_id"),
          col("event_type")))
      SftAssembly.tokenPackingOf(
          SftAssembly.conversationThreadsOf(turnCols), turnCols,
          toks, nDocs, budget)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
    }
    // user 1's valid thread arrives first; user 5's valid thread
    // arrives LATE and hash-sorts BEFORE it (md5("5:0") < md5("1:0")),
    // so the late batch must shift user 1's cut point
    val a: Seq[Turn] = Seq((100L, 1L, 1000L, "click", 5.0),
      (101L, 1L, 2000L, "error", 9.0))
    val b: Seq[Turn] = Seq((500L, 5L, 1000L, "click", 1.0),
      (501L, 5L, 2000L, "purchase", 2.0))
    val out = tmp()
    push(out, 0L, a)
    val early = packSnap(out)
    assert(early == wantPack(a))
    assert(early.nonEmpty)
    push(out, 1L, b)
    val full = packSnap(out)
    assert(full == wantPack(a ++ b))
    // the late batch globally repacked: user 1's thread is identical
    // in both snapshots (same turns, same token weight), but its
    // packing row moved because a hash-earlier thread arrived — an
    // accumulated packing could never do this
    val earlyU1 = early.filter(t => t._1 == 1L)
    val fullU1 = full.filter(t => t._1 == 1L)
    assert(earlyU1.nonEmpty && fullU1.nonEmpty && earlyU1 != fullU1,
      "late hash-earlier thread must shift user 1's cut point")
    // the q201/q202 snapshots ride the same cores: manifest and mask
    // of the streamed state equal the batch cores over the union
    val gotManifest = StreamingSft.snapshotSequenceManifest(
        spark, out, toks, nDocs, budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val turnCols = SftAssembly.turnColumnsOf(
      turnsDf(a ++ b).select(col("user_id"), col("us"), col("event_id"),
        col("event_type")))
    val wantPacked = SftAssembly.tokenPackingOf(
      SftAssembly.conversationThreadsOf(turnCols), turnCols,
      toks, nDocs, budget)
    val wantManifest = SftAssembly.sequenceManifestOf(wantPacked, budget)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(gotManifest == wantManifest && gotManifest.nonEmpty)
    val gotMask = StreamingSft.snapshotLossMask(
        spark, out, toks, nDocs, budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val wantTurns = turnCols
      .select(col("user_id"), col("day"), col("us"), col("event_id"),
        col("role"), (col("event_id") % nDocs).as("doc_id"))
      .join(toks, Seq("doc_id"))
    val wantMask = SftAssembly.lossMaskLayoutOf(wantPacked, wantTurns,
        budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(gotMask == wantMask && gotMask.nonEmpty)
    // mask totals conserve against the manifest per sequence
    val usedBySeq = gotManifest.map(m => m._1 -> m._4).toMap
    gotMask.foreach { m =>
      assert(m._2 + m._3 == usedBySeq(m._1), s"seq ${m._1} mask leak")
    }
  }

  test("q205 append-packing snapshot freezes the shipped artifact's " +
      "slots while plain repacking moves them, and packs the late " +
      "thread past the last shipped byte") {
    val toks = Seq((0L, 3L), (1L, 5L), (2L, 2L), (3L, 7L), (4L, 4L))
      .toDF("doc_id", "toks")
    val nDocs = 5L
    val budget = 8L
    // same scenario as the q200 test: user 5's late thread hash-sorts
    // BEFORE user 1's shipped thread
    val a: Seq[Turn] = Seq((100L, 1L, 1000L, "click", 5.0),
      (101L, 1L, 2000L, "error", 9.0))
    val b: Seq[Turn] = Seq((500L, 5L, 1000L, "click", 1.0),
      (501L, 5L, 2000L, "purchase", 2.0))
    val out = tmp()
    push(out, 0L, a)
    // the shipped export: materialized NOW (localCheckpoint) — a lazy
    // frame would silently re-derive over the grown index
    val prevPacked = StreamingSft.snapshotTokenPacking(
      spark, out, toks, nDocs, budget).localCheckpoint()
    push(out, 1L, b)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    val got = StreamingSft.snapshotAppendPacking(
        spark, out, prevPacked, toks, nDocs, budget).collect()
      .map(r => (key(r), r.getBoolean(6))).toSet
    // equals the batch core over (shipped artifact, union packing)
    val turnCols = SftAssembly.turnColumnsOf(
      turnsDf(a ++ b).select(col("user_id"), col("us"), col("event_id"),
        col("event_type")))
    val fullPacked = SftAssembly.tokenPackingOf(
      SftAssembly.conversationThreadsOf(turnCols), turnCols,
      toks, nDocs, budget)
    val want = SftAssembly.appendPackingOf(prevPacked, fullPacked,
        budget).collect().map(r => (key(r), r.getBoolean(6))).toSet
    assert(got == want && got.nonEmpty)
    // user 1's unchanged thread: plain repacking moved it (pinned by
    // the q200 test above), append mode keeps the SHIPPED slot
    val shippedU1 = prevPacked.collect().map(key).filter(_._1 == 1L)
    assert(shippedU1.nonEmpty)
    assert(got.filter(_._1._1 == 1L) ==
      shippedU1.map(k => (k, true)).toSet)
    // user 5's new thread is appended, past the last shipped byte
    val shippedTokens = prevPacked.collect().map(r => r.getLong(3)).sum
    val base = (shippedTokens - 1) / budget + 1
    val u5 = got.filter(_._1._1 == 5L)
    assert(u5.nonEmpty && u5.forall { case (k, frozen) =>
      !frozen && k._5 >= base
    })
  }

  test("a re-delivered event supersedes latest-wins: the corrected " +
      "reward flips the preference pair") {
    val out = tmp()
    push(out, 0L, log)
    // upstream correction: event 102's reward becomes the pool max —
    // chosen for user 1 must flip from 101 to 102
    push(out, 1L, Seq((102L, 1L, 3000L, "view", 99.0)))
    val corrected = log.filterNot(_._1 == 102L) :+
      ((102L, 1L, 3000L, "view", 99.0): Turn)
    assert(cardSnap(out) == wantCard(corrected))
    assert(threadSnap(out) == wantThreads(corrected))
    // exact duplicate re-observation changes nothing
    push(out, 2L, Seq((100L, 1L, 1000L, "click", 5.0)))
    assert(cardSnap(out) == wantCard(corrected))
  }

  test("replays are idempotent, including an emptied replay clearing " +
      "its stale rows") {
    val out = tmp()
    val (a, b) = log.splitAt(5)
    push(out, 0L, a); push(out, 1L, b)
    val before = (threadSnap(out), cardSnap(out))
    push(out, 1L, b) // same batch re-delivered
    assert((threadSnap(out), cardSnap(out)) == before)
    push(out, 1L, Seq.empty) // emptied replay drops batch 1's rows
    assert(threadSnap(out) == wantThreads(a))
    push(out, 1L, b) // and re-delivery restores
    assert((threadSnap(out), cardSnap(out)) == before)
  }

  test("empty bootstrap yields empty snapshots; foreign state refused") {
    val out = tmp()
    assert(StreamingSft.snapshotThreads(spark, out).isEmpty)
    assert(StreamingSft.snapshotCard(spark, out).isEmpty)
    // a null-id turn can never be threaded — dropped at ingest
    push(out, 0L, Seq.empty)
    StreamingSft.processBatch(
      Seq((Option.empty[Long], Option(1L), 5L, "click", 1.0))
        .toDF("event_id", "user_id", "us", "event_type", "value"),
      1L, out)
    assert(StreamingSft.snapshotThreads(spark, out).isEmpty)
    val foreign = tmp()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(foreign, "stray.parquet"), "junk")
    val e = intercept[IllegalArgumentException] {
      StreamingSft.readTurns(spark, foreign).collect()
    }
    assert(e.getMessage.contains("SFT turn index"))
  }
}
