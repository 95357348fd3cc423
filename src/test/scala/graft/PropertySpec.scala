package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ops.{Clean, Enrich}
import graft.schema.Schemas

/** Property-based invariants (SURVEY.md §5.3) via raw ScalaCheck props
  * executed inside ScalaTest. */
class PropertySpec extends SparkSpecBase {

  private def check(prop: Prop, minTests: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  test("fingerprint64 eval equals the reference byte fold for arbitrary strings") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val viaExpr = graft.functions.Fingerprint64(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s)))
        .eval(null).asInstanceOf[Long]
      viaExpr == graft.functions.Fingerprint64.hashBytes(s.getBytes("UTF-8"))
    }, minTests = 100)
  }

  test("missingColumns reports exactly the dropped required columns") {
    import spark.implicits._
    val base = Seq.empty[(String, Double, Double, Double, Double, Double, Double, Double)]
      .toDF(Schemas.requiredCols: _*)
    check(Prop.forAll(Gen.someOf(Schemas.requiredCols)) { dropped =>
      val df = dropped.foldLeft(base)((d, c) => d.drop(c))
      Clean.missingColumns(df).toSet == dropped.toSet
    })
  }

  test("enrichment is idempotent for arbitrary fact/dim states") {
    import spark.implicits._
    val genRows = for {
      n <- Gen.choose(1, 12)
      rows <- Gen.listOfN(n, for {
        sid <- Gen.oneOf("s1", "s2", "s3", "s4")
        num <- Gen.option(Gen.choose(1, 5))
      } yield (sid, num))
    } yield rows
    check(Prop.forAll(genRows) { rows =>
      val fact = rows.toDF("simulation_id", "simulation_num")
      val dim = Seq(("s1", 1), ("s3", 3)).toDF("simulation_id", "simulation_num")
      val once = Enrich.enrichFact(fact, dim)
        .orderBy("simulation_id", "simulation_num").collect().toSeq
      val twice = Enrich.enrichFact(Enrich.enrichFact(fact, dim), dim)
        .orderBy("simulation_id", "simulation_num").collect().toSeq
      once == twice
    }, minTests = 10)
  }

  test("ngram jaccard pairs are invariant under row order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g x"),
      (3L, "q w e r t y u i"),
      (4L, "q w e r t y u i"),
      (5L, "z z z y y y x x")
    ).toDF("doc_id", "text")
    def pairs(d: org.apache.spark.sql.DataFrame) =
      graft.ext.Dedup.ngramJaccardPairsOf(
        graft.ext.Dedup.shingleHashDfOf(d), 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = pairs(docs)
    assert(expect.contains((3L, 4L))) // identical docs must pair
    check(Prop.forAll(Gen.choose(0L, 1000L)) { seed =>
      pairs(docs.orderBy(pmod(xxhash64(col("doc_id"), lit(seed)), lit(5)))) == expect
    }, minTests = 5)
  }
}
