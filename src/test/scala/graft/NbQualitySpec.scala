package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis

/** q160 trained NB quality classifier: the learned model separates a
  * planted reference class, refuses a one-class training set, and the
  * scoring join stays broadcast (the q122 scale contract carries over
  * to the trained path). The arithmetic itself is pinned by the DuckDB
  * oracle; these specs pin the LEARNING behavior the oracle can't
  * distinguish from a lookup table. */
class NbQualitySpec extends SparkSpecBase {

  private def corpus(n: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map { id =>
      if (id < n / 2)
        (id, "clean measured prose with citations and structure", "ref")
      else
        (id, "buy now click here free spam offer junk", "web")
    }.toDF("doc_id", "text", "source")
  }

  test("training separates the classes: every doc (train AND held-out " +
      "splits) is predicted into its true class when the classes share " +
      "no vocabulary") {
    val scored = TextAnalysis.nbQualityOf(corpus(40), Seq("ref")).collect()
    assert(scored.length == 40)
    // the held-out splits exist in this fixture (otherwise the test
    // only proves memorization)
    assert(scored.map(_.getAs[String]("split")).toSet.size >= 2)
    scored.foreach { r =>
      assert(r.getAs[Boolean]("pred_ref") == r.getAs[Boolean]("is_ref"),
        s"doc ${r.getAs[Long]("doc_id")} split ${r.getAs[String]("split")}")
    }
    // margins are symmetric-ish, not degenerate constants
    assert(scored.map(_.getAs[Long]("margin_micro")).distinct.length >= 2)
  }

  test("shared vocabulary dilutes but does not flip: classes that " +
      "differ in only one token still separate") {
    import spark.implicits._
    val docs = (0L until 40L).map { id =>
      val base = "the quick brown fox jumps over the lazy dog"
      if (id < 20L) (id, s"$base excellent", "ref")
      else (id, s"$base terrible", "web")
    }.toDF("doc_id", "text", "source")
    val scored = TextAnalysis.nbQualityOf(docs, Seq("ref")).collect()
    scored.foreach { r =>
      assert(r.getAs[Boolean]("pred_ref") == r.getAs[Boolean]("is_ref"),
        s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("one-class training set is refused, not mislabeled") {
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.nbQualityOf(corpus(40), Seq("nonexistent")).collect()
    }
    assert(ex.getMessage.contains("both classes"))
  }

  test("q161 eval report reconciles against the per-doc q160 rows: " +
      "every confusion cell is the count of matching documents and " +
      "accuracy is (tp+tn)/n") {
    val scored = TextAnalysis.nbQualityClassifier(spark, sf0001).collect()
    val report = TextAnalysis.nbEvalReport(spark, sf0001).collect()
    assert(report.map(_.getAs[String]("split")).toSeq.sorted ==
      Seq("test", "train", "val"))
    report.foreach { r =>
      val s = scored.filter(_.getAs[String]("split") ==
        r.getAs[String]("split"))
      def cell(ref: Boolean, pred: Boolean): Long = s.count(x =>
        x.getAs[Boolean]("is_ref") == ref &&
          x.getAs[Boolean]("pred_ref") == pred).toLong
      assert(r.getAs[Long]("n_docs") == s.length.toLong)
      assert(r.getAs[Long]("tp") == cell(true, true))
      assert(r.getAs[Long]("fp") == cell(false, true))
      assert(r.getAs[Long]("fn") == cell(true, false))
      assert(r.getAs[Long]("tn") == cell(false, false))
      val acc = (r.getAs[Long]("tp") + r.getAs[Long]("tn")).toDouble /
        r.getAs[Long]("n_docs")
      assert(math.abs(r.getAs[Double]("accuracy") - acc) < 1e-4 + 1e-9)
    }
  }

  test("q164 calibration table reconciles against the per-doc rows: " +
      "each band's counts recompute, totals cover the corpus, and the " +
      "margin actually spreads across bands") {
    val scored = TextAnalysis.nbQualityClassifier(spark, sf0001).collect()
    val cal = TextAnalysis.nbCalibration(spark, sf0001).collect()
    assert(cal.length >= 4, s"degenerate table: ${cal.length} bands")
    assert(cal.map(_.getAs[Long]("n_docs")).sum == scored.length.toLong)
    assert(cal.map(_.getAs[Long]("n_ref")).sum ==
      scored.count(_.getAs[Boolean]("is_ref")).toLong)
    cal.foreach { r =>
      val b = r.getAs[Long]("band")
      val mine = scored.filter { x =>
        val band = math.max(-12L, math.min(12L,
          math.floor(x.getAs[Long]("margin_micro").toDouble / 5e5).toLong))
        band == b
      }
      assert(r.getAs[Long]("n_docs") == mine.length.toLong, s"band $b")
      assert(r.getAs[Long]("n_ref") ==
        mine.count(_.getAs[Boolean]("is_ref")).toLong, s"band $b")
    }
    // the signal exists: the top-third bands' pooled ref share exceeds
    // the bottom-third's (calibration = share rises with margin)
    val sorted = cal.sortBy(_.getAs[Long]("band"))
    val third = sorted.length / 3
    def share(rs: Seq[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Long]("n_ref")).sum.toDouble /
        rs.map(_.getAs[Long]("n_docs")).sum
    assert(share(sorted.takeRight(third)) > share(sorted.take(third)))
  }

  test("q160 plan: the scoring join broadcasts the weight table — no " +
      "sort-merge join anywhere in the trained path") {
    val plan = TextAnalysis.nbQualityClassifier(spark, sf0001)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }
}
