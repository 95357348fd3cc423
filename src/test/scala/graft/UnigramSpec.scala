package graft

import org.apache.spark.sql.functions._

import graft.ext.Unigram

/** Unigram tokenizer machinery: Viterbi segmentation semantics
  * (min-cost path, tiebreaks, refusals), seeding rules, and
  * partition-count invariance of the trained counts. The cross-engine
  * training/encode identity itself is gated by the q185/q186 DuckDB
  * oracles. */
class UnigramSpec extends SparkSpecBase {
  import spark.implicits._

  test("segment picks the min-cost path, not the greedy-longest one") {
    // 'ab' is cheap, 'abc' expensive: "abc" should split ab|c even
    // though a 3-char piece exists
    val cost = Map("a" -> 100L, "b" -> 100L, "c" -> 100L,
      "ab" -> 10L, "abc" -> 500L)
    assert(Unigram.segment("abc", cost) == List("ab", "c"))
    // make the whole piece cheapest and it wins
    assert(Unigram.segment("abc",
      cost.updated("abc", 50L)) == List("abc"))
  }

  test("cost ties break toward the smallest split point (longest " +
      "final piece), the oracle's ORDER BY total, j") {
    // both a|bc and ab|c cost 20; smallest j for the final piece wins:
    // position 3 considers j=1 ('bc') before j=2 ('c')
    val cost = Map("a" -> 10L, "b" -> 10L, "c" -> 10L,
      "ab" -> 10L, "bc" -> 10L)
    assert(Unigram.segment("abc", cost) == List("a", "bc"))
  }

  test("segment refuses unsegmentable words and over-long words " +
      "instead of guessing") {
    val e1 = intercept[IllegalArgumentException] {
      Unigram.segment("ax", Map("a" -> 1L))
    }
    assert(e1.getMessage.contains("unsegmentable"))
    val e2 = intercept[IllegalArgumentException] {
      Unigram.segment("x" * (Unigram.MaxWordLen + 1),
        Map("x" -> 1L))
    }
    assert(e2.getMessage.contains("DP unroll"))
  }

  test("seedVocab keeps single chars unconditionally and thresholds " +
      "longer pieces at MinSeed weighted occurrences") {
    val wc = Seq(("abd", 1L), ("xy", 3L)).toDF("w", "n")
    val seed = Unigram.seedVocab(wc).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'd' occurs once (weight 1) — kept as a single char
    assert(seed("d") == 1L)
    // 'ab' occurs once with weight 1 — below MinSeed=2, dropped
    assert(!seed.contains("ab"))
    // 'xy' weight 3 — kept
    assert(seed("xy") == 3L)
    assert(seed("x") == 3L && seed("y") == 3L)
  }

  test("trainCounts is invariant under input partitioning and keeps " +
      "the fixed vocabulary with zeros") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).localCheckpoint()
    def counts(parts: Int) =
      Unigram.trainCounts(docs.repartition(parts))
        .orderBy(col("p")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toList
    val a = counts(1)
    val b = counts(7)
    assert(a == b)
    // EM moved mass: some seed pieces end at zero usage, and total
    // usage is positive
    assert(a.exists(_._2 == 0L))
    assert(a.map(_._2).sum > 0L)
  }

  test("property: DP cost equals brute-force enumeration over all " +
      "segmentations, and pieces reassemble the word") {
    // deterministic pseudo-random cost tables over a 3-letter alphabet;
    // enumeration of a length-8 word has at most 2^7 = 128 splits
    val rng = new scala.util.Random(13)
    def enumerate(w: String): Iterator[List[String]] =
      if (w.isEmpty) Iterator(Nil)
      else (1 to math.min(Unigram.MaxPiece, w.length)).iterator
        .flatMap(l => enumerate(w.drop(l)).map(w.take(l) :: _))
    for (trial <- 1 to 40) {
      val w = Seq.fill(3 + rng.nextInt(6))("abc" (rng.nextInt(3))).mkString
      val pieces = (for {
        i <- 0 until w.length
        l <- 1 to math.min(Unigram.MaxPiece, w.length - i)
      } yield w.substring(i, i + l)).distinct
      // drop ~30% of multi-char pieces; single chars stay (the vocab rule)
      val cost: Map[String, Long] = pieces.collect {
        case p if p.length == 1 || rng.nextDouble() > 0.3 =>
          p -> (1L + rng.nextInt(1000))
      }.toMap
      val got = Unigram.segment(w, cost)
      assert(got.mkString == w, s"trial $trial: pieces don't reassemble")
      val gotCost = got.map(cost).sum
      val bestCost = enumerate(w)
        .filter(_.forall(cost.contains))
        .map(_.map(cost).sum).min
      assert(gotCost == bestCost,
        s"trial $trial: DP $gotCost vs enumeration $bestCost for '$w'")
    }
  }

  test("scoresOf costs are positive micro-nats and monotone in count " +
      "(rarer piece costs more)") {
    val counts = Seq(("aa", 100L), ("bb", 1L)).toDF("p", "c")
    val sc = Unigram.scoresOf(counts)
    assert(sc("aa") > 0L && sc("bb") > sc("aa"))
  }
}
