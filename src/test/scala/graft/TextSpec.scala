package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis
import graft.functions.Fingerprint64

class TextSpec extends SparkSpecBase {

  test("fingerprint64 expression matches the reference Scala implementation") {
    import spark.implicits._
    val texts = Seq("", "a", "hello world", "the quick brown fox")
    val got = texts.toDF("text")
      .select(Fingerprint64.fingerprint64(col("text")))
      .collect().map(_.getLong(0))
    val want = texts.map(t => Fingerprint64.hashBytes(t.getBytes("UTF-8")))
    assert(got.toSeq == want)
  }

  test("fingerprint64 survives codegen and interpreted paths identically") {
    import spark.implicits._
    val df = Seq.fill(100)("codegen probe text").toDF("text")
    // wholestage on (default) — large enough to codegen
    val a = df.select(Fingerprint64.fingerprint64(col("text"))).distinct().collect()
    assert(a.length == 1)
    assert(a(0).getLong(0) ==
      Fingerprint64.hashBytes("codegen probe text".getBytes("UTF-8")))
  }

  test("fingerprint64 rejects non-string input at analysis time") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(1L).toDF("x").select(Fingerprint64.fingerprint64(col("x"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("fingerprint64"))
  }

  test("quality metrics: stop_ratio and token counts are consistent") {
    val q = TextAnalysis.quality(spark, sf0001)
    val bad = q.filter(
      col("stop_ratio") < 0 || col("stop_ratio") > 1 ||
        col("n_uniq_tokens") > col("n_tokens")).count()
    assert(bad == 0)
  }

  test("langId emits a prediction and bounded confidence for every doc") {
    val l = TextAnalysis.langId(spark, sf0001)
    assert(l.count() == 500)
    assert(l.filter(col("confidence") < 0 || col("confidence") > 1).count() == 0)
    assert(l.filter(col("pred_lang").isNull).count() == 0)
  }
}
