package graft

import org.apache.spark.sql.SparkSession
import graft.functions.Fingerprint64
import graft.plans.AsOfJoinStrategy

/** GraftExtensions: a session built with
  * spark.sql.extensions=graft.GraftExtensions gets the custom SQL
  * functions and the as-of planner strategy with zero Scala-API calls. */
class ExtensionsSpec extends SparkSpecBase {

  private def withExtendedSession[A](f: SparkSession => A): A = {
    val prev = spark // force init of the shared session / context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions applies the same class the spark.sql.extensions
      // static conf names (a static conf cannot be applied when the test
      // JVM's SparkContext already exists)
      val s2 = SparkSession.builder()
        .master("local[4]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate() // shares the SparkContext, new session state
      f(s2)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("SQL functions registered via spark.sql.extensions") {
    withExtendedSession { s2 =>
      val fp = s2.sql("SELECT fingerprint64('hello world')")
        .collect()(0).getLong(0)
      assert(fp == Fingerprint64.hashBytes("hello world".getBytes("UTF-8")))
      // 'a b c d e' has 4 distinct 2-gram shingles
      val n2 = s2.sql("SELECT size(shingle_hashes('a b c d e', 2))")
        .collect()(0).getInt(0)
      assert(n2 == 4)
      // default k = 3 -> 3 shingles
      val n3 = s2.sql("SELECT size(shingle_hashes('a b c d e'))")
        .collect()(0).getInt(0)
      assert(n3 == 3)
      val scores = s2.sql("SELECT trigram_lang_scores('the of and to in')")
        .collect()(0).getSeq[Double](0)
      assert(scores.length == 5)
      assert(scores.exists(_ > 0.0))
      // portable md5-60bit shingle hash: value equals the SQL-expressible
      // hex-parse of md5 over the joined shingle string
      val hm = s2.sql("SELECT shingle_hashes_md5('a b c', 3)")
        .collect()(0).getSeq[Long](0)
      val want = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest("a b c".getBytes("UTF-8"))
          .take(8).map("%02x".format(_)).mkString.take(15), 16)
      assert(hm == Seq(want))
      // integer sums twin: langs sums + trigram count appended
      val sums = s2.sql("SELECT trigram_lang_score_sums('the of and to in')")
        .collect()(0).getSeq[Long](0)
      assert(sums.length == 6 && sums.last > 0 && sums.exists(_ > 0))
      // identical vectors -> cosine 1.0 (within float->double exactness)
      val cos = s2.sql(
        """SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
                                    array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))""")
        .collect()(0).getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-15)
      // exact integer dot: 2*4 + 3*5 = 23, and the kernel matches a
      // hand-summed reference on larger values near the micro-unit range
      val d = s2.sql("SELECT int_dot(array(2L, 3L), array(4L, 5L))")
        .collect()(0).getLong(0)
      assert(d == 23L)
      val big = s2.sql(
        "SELECT int_dot(array(600000L, -599999L), array(600000L, 600000L))")
        .collect()(0).getLong(0)
      assert(big == 600000L * 600000L - 599999L * 600000L)
    }
  }

  test("sketch aggregates usable from plain GROUP BY SQL") {
    withExtendedSession { s2 =>
      s2.range(0, 100)
        .selectExpr("id % 5 AS g", "xxhash64(CAST(id % 30 AS STRING)) AS h",
          "concat('tok', CAST(id % 3 AS STRING)) AS tok")
        .createOrReplaceTempView("ext_agg_in")
      // minhash: k-long signature per group
      val sig = s2.sql(
        "SELECT g, minhash_sketch(h, 16) AS s FROM ext_agg_in GROUP BY g")
        .collect()
      assert(sig.length == 5 && sig.forall(_.getSeq[Long](1).length == 16))
      // simhash: one long per group
      assert(s2.sql(
        "SELECT simhash_sketch(h) FROM ext_agg_in").collect().length == 1)
      // kmv below k is exact: 30 distinct hashes
      val kmv = s2.sql(
        "SELECT size(kmv_sketch(h, 64)) FROM ext_agg_in")
        .collect()(0).getInt(0)
      assert(kmv == 30)
      // misra-gries retains all 3 tokens with exact counts (k > distinct)
      val mg = s2.sql(
        "SELECT misra_gries(tok, 8) FROM ext_agg_in")
        .collect()(0).getMap[String, Long](0)
      assert(mg.keySet == Set("tok0", "tok1", "tok2"))
      assert(mg.values.sum == 100)
      // bloom: build over the 30 distinct hashes, probe in the same SQL —
      // every member found, a disjoint probe set nearly all rejected
      val bl = s2.sql(
        """WITH f AS (SELECT bloom_build(h, 65536, 7) AS bf FROM ext_agg_in)
           SELECT
             (SELECT count(*) FROM ext_agg_in, f
               WHERE might_contain(f.bf, h)) AS members,
             (SELECT count(*) FROM (SELECT xxhash64(CAST(id + 1000 AS STRING)) AS h2
                 FROM range(200)), f
               WHERE might_contain(f.bf, h2)) AS strangers""")
        .collect()(0)
      assert(bl.getLong(0) == 100, s"all member rows probe true: $bl")
      assert(bl.getLong(1) < 10, s"strangers mostly rejected: $bl")
    }
  }

  test("as-of planner strategy injected via spark.sql.extensions") {
    withExtendedSession { s2 =>
      assert(s2.sessionState.planner.strategies.contains(AsOfJoinStrategy))
    }
  }

  test("plain sessions do not leak the injected functions") {
    val e = intercept[Exception] {
      spark.sql("SELECT fingerprint64('x')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("fingerprint64"))
  }
}
