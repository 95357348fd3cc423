package graft

import org.apache.spark.sql.functions._
import graft.ext.{BucketCap, Dedup}

class DedupSpec extends SparkSpecBase {

  private lazy val exactPairs =
    Dedup.ngramJaccardPairs(spark, sf0001, tau = 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash LSH recovers every exact jaccard>=0.8 pair (recall 1.0 here)") {
    val mh = Dedup.minhashPairs(spark, sf0001)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.nonEmpty)
    assert(exactPairs.subsetOf(mh),
      s"missed: ${exactPairs -- mh}")
  }

  test("simhash hamming<=3 pairs are true near-dups (precision 1.0 here)") {
    val sh = Dedup.simhashPairs(spark, sf0001)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh.nonEmpty)
    assert(sh.subsetOf(exactPairs), s"false positives: ${sh -- exactPairs}")
  }

  test("BucketCap.hotBuckets reports only oversized buckets") {
    import spark.implicits._
    val banded = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y"))
      .toDF("id", "bkt")
    val hot = BucketCap.hotBuckets(banded, Seq("bkt"), cap = 2).collect()
    assert(hot.map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("x", 3L)))
  }

  test("capBuckets drops hot buckets inside the query's own dataflow " +
      "and its WARN summary is never silent for non-zero drops") {
    import spark.implicits._
    val banded = ((1L to 5L).map(i => (i, "hot")) ++ Seq((6L, "ok")))
      .toDF("doc_id", "bkt")
    val out = BucketCap.capBuckets(banded, Seq("bkt"), cap = 3,
      "spec-cap").collect()
    // behavior: hot bucket dropped, survivor kept, column order intact
    assert(out.map(_.getLong(0)).toSet == Set(6L))
    // the guard must also hold when the capped frame materializes only
    // through a checkpoint (the session-memo / streaming consumption
    // path, where a listener-based report would never fire)
    val viaCp = BucketCap.capBuckets(banded, Seq("bkt"), cap = 3,
      "spec-cap-cp").localCheckpoint().collect()
    assert(viaCp.map(_.getLong(0)).toSet == Set(6L))
    // the WARN text itself: exact counts, silent only at zero drops
    assert(BucketCap.partitionWarning(1L, 5L, 3, "spec-cap") ==
      Some("spec-cap: dropping 1 hot bucket(s) (> 3 members, 5 banded " +
        "rows) from candidate generation; route them to exact dedup"))
    assert(BucketCap.partitionWarning(0L, 0L, 3, "spec-cap").isEmpty)
  }

  test("hot-bucket cap drops the boilerplate cluster's pairs, keeps " +
      "normal near-dups, and cap<=0 disables the guard") {
    import spark.implicits._
    // 40 identical boilerplate docs -> every band bucket holds 40 members;
    // one honest near-dup pair (1 of 10 shingles differs, jaccard ~0.82)
    val boiler = (100L until 140L).map(i =>
      (i, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"))
    val pair = Seq(
      (1L, "the quick brown fox jumps over the lazy dog every single day"),
      (2L, "the quick brown fox jumps over the lazy dog every single night"))
    val docs = (boiler ++ pair).toDF("doc_id", "text")
    val capped = Dedup.minhashPairsOf(docs, maxBucket = 10)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((1L, 2L)))
    assert(!capped.exists { case (x, y) => x >= 100L || y >= 100L },
      s"boilerplate pairs survived the cap: $capped")
    val uncapped = Dedup.minhashPairsOf(docs, maxBucket = 0)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((1L, 2L)) && uncapped.contains((100L, 101L)))
  }

  test("capped hot buckets are recall-recoverable: " +
      "components(capped ∪ recovered) = components(uncapped)") {
    import spark.implicits._
    // 40 identical boilerplate docs (hot bucket in all 16 bands at cap 10)
    // + one honest near-dup pair that stays under the cap
    val boiler = (100L until 140L).map(i =>
      (i, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"))
    val pair = Seq(
      (1L, "the quick brown fox jumps over the lazy dog every single day"),
      (2L, "the quick brown fox jumps over the lazy dog every single night"))
    val docs = (boiler ++ pair).toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairSet(Dedup.minhashPairsOf(docs, maxBucket = 0))
    val capped = pairSet(Dedup.minhashPairsOf(docs, maxBucket = 10))
    val recovered = pairSet(Dedup.hotBucketRecoveryOf(docs, maxBucket = 10))
    assert(recovered.nonEmpty && (capped & recovered).isEmpty)
    // star output: m-1 spanning pairs per exact-duplicate group (not
    // C(m,2) — that would re-create the quadratic blowup the cap
    // prevents), every pair true in the uncapped run
    assert(recovered.size == 39, s"got ${recovered.size}")
    assert(recovered.subsetOf(uncapped))
    // what clustering consumes is connectivity — prove it's identical
    def components(pairs: Set[(Long, Long)]): Set[Set[Long]] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
      }
      parent.keys.toSeq.groupBy(find).values.map(_.toSet).toSet
    }
    assert(components(capped | recovered) == components(uncapped))
  }

  test("incremental near-dup flags batch docs colliding with seen corpus") {
    import spark.implicits._
    val seen = Seq(
      (2L, "the quick brown fox jumps over the lazy dog every single day"),
      (4L, "completely different content about databases and indexes here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (11L, "the quick brown fox jumps over the lazy dog every single night"),
      (13L, "unrelated fresh material with nothing shared at all whatsoever"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalNearDupOf(batch, seen).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList
    assert(got == List((11L, 2L)), s"got $got")
  }

  test("exact dedup groups identical texts only") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c", 5L), (2L, "a b c", 5L), (3L, "x y z", 5L)
    ).toDF("doc_id", "text", "n_chars")
    docs.createOrReplaceTempView("tmp_docs")
    val grouped = docs.groupBy(md5(col("text").cast("binary")))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(grouped == Set((1L, 2L), (3L, 1L)))
  }

  test("incrementalNew drops seen digests and within-batch duplicates") {
    import spark.implicits._
    val seen = Seq("old text one", "old text two")
      .toDF("text").select(sha2(col("text"), 256).as("digest"))
    val batch = Seq(
      (10L, "old text one"),  // already ingested -> dropped
      (11L, "fresh text"),    // new -> kept
      (12L, "fresh text"),    // within-batch dup -> dropped (11 wins)
      (13L, "another fresh")  // new -> kept
    ).toDF("doc_id", "text")
      .select(col("doc_id"), sha2(col("text"), 256).as("digest"))
    val got = Dedup.incrementalNew(batch, seen)
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(got == Seq(11L, 13L))
  }

  test("span dedup keeps first occurrence, drops repeats, erases all-boilerplate docs") {
    import spark.implicits._
    // k=2 spans. doc 1: [a b][c d]; doc 2 repeats doc 1's first span then
    // fresh material [a b][e f]; doc 3 is ENTIRELY doc-1 spans -> erased;
    // doc 4 repeats its own span within the document [g h][g h] -> one kept
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "a b c d"),
      (4L, "g h g h")
    ).toDF("doc_id", "text")
    val got = Dedup.spanDedupOf(docs, k = 2).orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList
    assert(got == List(
      (1L, 2L, "a b c d"),   // first occurrences of both spans
      (2L, 1L, "e f"),       // "a b" was doc 1's -> dropped
      (4L, 1L, "g h")))      // within-doc repeat collapses; doc 3 gone
  }

  test("span dedup trailing short span survives and order is preserved") {
    import spark.implicits._
    val docs = Seq((7L, "p q r s t")).toDF("doc_id", "text") // [p q][r s][t]
    val got = Dedup.spanDedupOf(docs, k = 2).head()
    assert(got.getLong(1) == 3L && got.getString(2) == "p q r s t")
  }

  test("repeat spans: overlapping repeats merge, gaps split, " +
      "within-doc repeats keep the first copy") {
    import spark.implicits._
    // k=3 windows. doc 1 holds the corpus-first copies; doc 2 repeats a
    // 4-token substring mid-document (overlapping windows @2,@3 merge);
    // doc 3 is a full-document repeat; doc 4 repeats its own opening
    // window at the end; doc 5 has two repeats split by fresh material
    // (gap > 1 -> two spans)
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "x a b c d y"),
      (3L, "a b c d e"),
      (4L, "g h i g h i"),
      (5L, "a b c Z c d e")
    ).toDF("doc_id", "text")
    val got = Dedup.repeatSpansOf(docs, k = 3)
      .orderBy(col("doc_id"), col("span_start"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    assert(got == List(
      (2L, 2L, 5L, 4L),  // [a b c]@2 + [b c d]@3 merge to tokens 2..5
      (3L, 1L, 5L, 5L),  // every window repeats doc 1 -> whole doc
      (4L, 4L, 6L, 3L),  // within-doc repeat of the opening window
      (5L, 1L, 3L, 3L),  // [a b c]@1 ...
      (5L, 5L, 7L, 3L))) // ... gap at Z, then [c d e]@5 separately
  }

  test("repeat spans: back-to-back repeats fuse into one span") {
    import spark.implicits._
    // doc 2's windows @1..@3 all repeat doc 1 content; the marked
    // intervals [1,3],[2,4],[3,5] chain into a single 5-token span
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e f")
    ).toDF("doc_id", "text")
    val got = Dedup.repeatSpansOf(docs, k = 3)
      .orderBy(col("doc_id"), col("span_start"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    assert(got == List((2L, 1L, 5L, 5L)))
  }

  test("repeat span removal cuts marked ranges, erases fully-covered docs") {
    import spark.implicits._
    // same corpus as the spans test (k=3): doc 2 loses tokens 2..5,
    // doc 3 disappears (whole doc covered), doc 4 loses its tail repeat,
    // doc 5 keeps only the fresh middle token
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "x a b c d y"),
      (3L, "a b c d e"),
      (4L, "g h i g h i"),
      (5L, "a b c Z c d e")
    ).toDF("doc_id", "text")
    val got = Dedup.repeatSpanRemovalOf(docs, k = 3).orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toList
    assert(got == List(
      (1L, 5L, "a b c d e"),  // corpus-first copies untouched
      (2L, 2L, "x y"),
      (4L, 3L, "g h i"),
      (5L, 1L, "Z")))         // doc 3 fully covered -> gone
  }

  test("repeat spans reconcile with removal: spans are disjoint and " +
      "token counts add up per document") {
    import spark.implicits._
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val spans = Dedup.repeatSpansOf(docs, k = 10).collect()
    // spans never overlap or touch within a document (maximal islands)
    spans.groupBy(_.getLong(0)).foreach { case (_, ss) =>
      ss.sortBy(_.getLong(1)).sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(1) > a.getLong(2) + 1,
            s"spans [$a] and [$b] should have merged")
        case _ =>
      }
    }
    // q121 removes exactly the span-covered tokens: for every doc,
    // tokens_total - sum(span n_tokens) == n_tokens_kept (docs fully
    // covered are absent from q121's output)
    val total = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cut = spans.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(3)).sum).toMap
    val kept = Dedup.repeatSpanRemovalOf(docs, k = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    total.foreach { case (doc, n) =>
      val expectKept = n - cut.getOrElse(doc, 0L)
      assert(kept.getOrElse(doc, 0L) == expectKept,
        s"doc $doc: $n total, ${cut.getOrElse(doc, 0L)} in spans, " +
          s"kept ${kept.getOrElse(doc, 0L)}")
    }
  }

  test("reusable Of forms plan no global range sort (q115 recipe, swept " +
      "codebase-wide in r10 — the streaming-consumed paths especially)") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val sigs = Dedup.minhashSignaturesOf(docs).localCheckpoint()
    val cases = Seq(
      // StreamingRepeatSpans pays this one per micro-batch
      "repeatSpansOf" -> Dedup.repeatSpansOf(docs, k = 10),
      "repeatSpanRemovalOf" -> Dedup.repeatSpanRemovalOf(docs, k = 10),
      // StreamingNearDup pays these two per micro-batch
      "selfNearDupSigs" -> Dedup.selfNearDupSigs(sigs),
      "incrementalNearDupSigs" -> Dedup.incrementalNearDupSigs(sigs, sigs),
      "minhashPairsOf" -> Dedup.minhashPairsOf(docs),
      "simhashPairsOf" -> Dedup.simhashPairsOf(docs),
      "ngramJaccardPairsOf" ->
        Dedup.ngramJaccardPairsOf(Dedup.shingleHashDfOf(docs), 0.8),
      "spanDedupOf" -> Dedup.spanDedupOf(docs),
      "incrementalNew" -> Dedup.incrementalNew(
        docs.select(col("doc_id"), md5(col("text")).as("digest")),
        docs.select(md5(col("text")).as("digest"))))
    for ((name, df) <- cases) {
      val p = df.queryExecution.executedPlan.toString
      // rangepartitioning = a global sort exchange; the per-doc islands
      // window sorts WITHIN hash partitions (SortExec over
      // hashpartitioning), which is the allowed, bounded shape
      assert(!p.contains("rangepartitioning"),
        s"$name plans a global range sort:\n${p.take(900)}")
    }
  }

  test("q120 keeper join broadcasts (executable form of the r9 manual " +
      "ExplainAudit check — a threshold drift must fail here, not drift)") {
    val df = Dedup.repeatSpans(spark, sf0001)
    df.collect() // let AQE finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(900))
  }

  test("shingle_hashes_pos preserves positions and equates equal windows") {
    import spark.implicits._
    val hs = Seq("a b c a b c").toDF("text")
      .select(graft.functions.ShingleHashes
        .shingle_hashes_pos(col("text"), 3).as("hs"))
      .head().getSeq[Long](0)
    assert(hs.length == 4)            // n-k+1 windows, position order
    assert(hs(0) == hs(3))            // "a b c" == "a b c"
    assert(Set(hs(0), hs(1), hs(2)).size == 3) // distinct windows differ
  }

  test("shingles: short docs yield empty array, k-grams are distinct") {
    import spark.implicits._
    val df = Seq("a b", "a b c d", "a b a b a b c d").toDF("text")
      .select(Dedup.shingles(col("text"), 3).as("sh"))
    val got = df.collect().map(_.getSeq[String](0).toList).toList
    assert(got(0) == Nil)
    assert(got(1) == List("a b c", "b c d"))
    // distinct: repeated "a b a" collapses
    assert(got(2).distinct == got(2))
  }
}
