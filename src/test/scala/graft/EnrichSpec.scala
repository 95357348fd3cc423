package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import graft.ops.Enrich
import graft.schema.Metadata

class EnrichSpec extends SparkSpecBase {
  import spark.implicits._

  private def dim = Seq(
    ("s1", 1), ("s2", 2)
  ).toDF("simulation_id", "simulation_num")

  private def fact = Seq(
    ("s1", None: Option[Int]), ("s2", Some(99)), ("s3", None)
  ).toDF("simulation_id", "simulation_num")

  test("enrichment assigns only null keys (D5 guard) and leaves unmatched null") {
    val out = Enrich.enrichFact(fact, dim)
      .orderBy("simulation_id")
      .select("simulation_id", "simulation_num")
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
    assert(out.toSeq == Seq(("s1", 1), ("s2", 99), ("s3", -1)))
  }

  test("enrichment is idempotent") {
    val once = Enrich.enrichFact(fact, dim)
    val twice = Enrich.enrichFact(once, dim)
    assert(once.orderBy("simulation_id").collect()
      .sameElements(twice.orderBy("simulation_id").collect()))
  }

  test("high-water mark is 0 on an empty table (first-run crash fixed)") {
    val empty = fact.filter(lit(false))
    assert(Enrich.highWaterMark(empty, "simulation_num") == 0L)
  }

  test("dim numbering continues from the high-water mark, ordered by (date_run, id)") {
    val meta = Seq(
      Metadata("b", "r", 1.0, 1, 2, 300, Date.valueOf("2024-03-02"), "ok", 1),
      Metadata("a", "r", 1.0, 1, 2, 300, Date.valueOf("2024-03-01"), "ok", 1),
      Metadata("c", "r", 1.0, 1, 2, 300, Date.valueOf("2024-03-01"), "ok", 1)
    ).toDS()
    val numbered = Enrich.numberDim(meta, startFrom = 10)
      .select("simulation_id", "simulation_num")
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(numbered == Map("a" -> 11, "c" -> 12, "b" -> 13))
  }

  test("numberDim fails fast on fact-sized input instead of feeding a " +
      "global window") {
    val meta = (1 to 4).map(i =>
      Metadata(s"s$i", "r", 1.0, 1, 2, 300, Date.valueOf("2024-03-01"),
        "ok", 1)).toDS()
    val e = intercept[IllegalArgumentException] {
      Enrich.numberDim(meta, startFrom = 0, maxDimRows = 3)
    }
    assert(e.getMessage.contains("dim-only"))
    // at the cap is still fine
    assert(Enrich.numberDim(meta, startFrom = 0, maxDimRows = 4)
      .count() == 4)
  }
}
