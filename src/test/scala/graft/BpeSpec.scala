package graft

import org.apache.spark.sql.functions._

import graft.ext.Bpe
import graft.functions.BpeOps

class BpeSpec extends SparkSpecBase {

  /** Driver-side reference BPE trainer (textbook sequential algorithm)
    * for equivalence checks against the distributed trainer. */
  private def refTrain(wordCounts: Map[String, Long],
      merges: Int, minPairCount: Long): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = wordCounts.map { case (w, n) =>
      (w.toCharArray.map(_.toString).toVector :+ Bpe.EndMark) -> n
    }
    val out = Seq.newBuilder[(String, String, Long)]
    var r = 0
    var done = false
    while (r < merges && !done) {
      val counts = collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Vector(a, b) =>
            counts((a, b)) = counts.getOrElse((a, b), 0L) + n
          case _ =>
        }
      }
      val best = counts.toSeq
        .sortBy { case ((l, rr), c) => (-c, l, rr) }.headOption
      best match {
        case Some(((l, rr), c)) if c >= minPairCount =>
          out += ((l, rr, c))
          vocab = vocab.map { case (syms, n) =>
            val merged = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rr) {
                merged += (l + rr); i += 2
              } else { merged += syms(i); i += 1 }
            }
            merged.result() -> n
          }.groupMapReduce(_._1)(_._2)(_ + _)
          r += 1
        case _ => done = true
      }
    }
    out.result()
  }

  /** Reference encode: greedy lowest-rank-first, all occurrences. */
  private def refEncode(word: String,
      ranks: Seq[(String, String)]): Vector[String] = {
    val rank = ranks.zipWithIndex.toMap
    var syms = word.toCharArray.map(_.toString).toVector :+ Bpe.EndMark
    var done = false
    while (!done && syms.length > 1) {
      val cand = syms.sliding(2).collect {
        case Vector(a, b) if rank.contains((a, b)) => rank((a, b))
      }.toSeq
      if (cand.isEmpty) done = true
      else {
        val bestRank = cand.min
        val (l, rr) = ranks(bestRank)
        val merged = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rr) {
            merged += (l + rr); i += 2
          } else { merged += syms(i); i += 1 }
        }
        syms = merged.result()
      }
    }
    syms
  }

  test("distributed BPE training equals the sequential reference on the " +
      "classic corpus") {
    import spark.implicits._
    // Sennrich et al.'s worked example vocabulary
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val docs = words.toSeq.flatMap { case (w, n) =>
      Seq.fill(n.toInt)(w)
    }.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    // both execution tiers must agree with the reference
    val got = Bpe.train(docs, merges = 10, minPairCount = 2)
    val gotDist = Bpe.train(docs, merges = 10, minPairCount = 2,
      driverThreshold = 0L)
    val want = refTrain(words, merges = 10, minPairCount = 2)
    assert(got == want, s"got $got\nwant $want")
    assert(gotDist == want, s"distributed tier diverged: $gotDist")
    // the famous first merges: ('e','s') then ('es','t') at count 9
    assert(got.take(2).map(t => (t._1, t._2)) ==
      Seq(("e", "s"), ("es", "t")))
    assert(got.take(2).map(_._3) == Seq(9L, 9L))
  }

  test("distributed BPE training equals the reference on real documents") {
    val docs = Tables(spark, sf0001, "documents")
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Bpe.train(docs, merges = 12)
    val gotDist = Bpe.train(docs, merges = 12, driverThreshold = 0L)
    val want = refTrain(words, merges = 12, minPairCount = 2L)
    assert(got == want, s"got $got\nwant $want")
    assert(gotDist == want, s"distributed tier diverged: $gotDist")
  }

  test("bpe_encode matches the reference encoder word by word") {
    import spark.implicits._
    val docs = Tables(spark, sf0001, "documents")
    val ranks = Bpe.train(docs, merges = 12).map(t => (t._1, t._2))
    val sample = Seq("the quick brown fox", "lowest newest w",
      "unseen zzz tokens", "")
    val got = sample.toDF("text")
      .select(BpeOps.bpe_encode(col("text"), ranks, Bpe.EndMark))
      .collect().map(_.getSeq[String](0).toVector)
    val want = sample.map(_.split(" ").filter(_.nonEmpty).toVector
      .flatMap(w => refEncode(w, ranks)))
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
  }

  test("q83 fertility: BPE tokens bounded by characters and at least " +
      "the word count") {
    val enc = Bpe.encodeCorpus(spark, sf0001, merges = 16)
    val rows = enc.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (words, bpe) = (r.getLong(1), r.getLong(2))
      assert(bpe >= words, s"each word is >= 1 token: $r")
    }
    // merges actually compress: total tokens strictly below the
    // character-level ceiling (chars + one end-mark per word)
    val docs = Tables(spark, sf0001, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("w"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("c"))
      .agg(sum(col("c") + col("w"))).head().getLong(0)
    val total = rows.map(_.getLong(2)).sum
    assert(total < docs, s"BPE total $total should beat char ceiling $docs")
  }
}
