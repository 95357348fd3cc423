package graft

import org.apache.spark.sql.functions._
import graft.ops.Scd

/** Value-level gates for the SCD2 builder and the CDC changelog
  * compactor (ops/Scd.scala) beyond the q92/q96 oracle rows: change
  * collapse, re-change to an earlier value, same-timestamp tiebreaks,
  * tombstone resurrection ordering, and null attribute transitions. */
class ScdSpec extends SparkSpecBase {

  import spark.implicits._

  test("scd2Of collapses runs and versions changes in order") {
    val log = Seq(
      // key 1: a, a, b, a  -> versions a / b / a (run of a collapsed)
      (1L, 10L, 100L, "a"),
      (1L, 20L, 101L, "a"),
      (1L, 30L, 102L, "b"),
      (1L, 40L, 103L, "a"),
      // key 2: single row -> one open version
      (2L, 15L, 104L, "x")
    ).toDF("k", "ts", "seq", "status")
    val got = Scd.scd2Of(log, "k", "ts", "seq", Seq("status"))
      .orderBy("k", "version")
      .select("k", "version", "status", "valid_from", "valid_to",
        "is_current")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
        r.getInt(5))).toList
    assert(got == List(
      (1L, 1, "a", 10L, Some(30L), 0),
      (1L, 2, "b", 30L, Some(40L), 0),
      (1L, 3, "a", 40L, None, 1),
      (2L, 1, "x", 15L, None, 1)))
  }

  test("scd2Of: same-ts rows order by tiebreak; null attrs compare null-safely") {
    val log = Seq(
      (1L, 10L, 1L, Some("a")),
      (1L, 10L, 2L, None),       // same ts, later seq -> a then null
      (1L, 20L, 3L, None),       // null run collapses
      (1L, 30L, 4L, Some("a"))
    ).toDF("k", "ts", "seq", "status")
    val got = Scd.scd2Of(log, "k", "ts", "seq", Seq("status"))
      .orderBy("version")
      .collect().map(r => (r.getInt(1), Option(r.getString(2)))).toList
    assert(got == List((1, Some("a")), (2, None), (3, Some("a"))))
  }

  test("scd2Of tracks multi-attribute changes (any column differing opens a version)") {
    val log = Seq(
      (1L, 10L, 1L, "a", 5),
      (1L, 20L, 2L, "a", 6), // second attr changes
      (1L, 30L, 3L, "a", 6)  // no change
    ).toDF("k", "ts", "seq", "s1", "s2")
    val got = Scd.scd2Of(log, "k", "ts", "seq", Seq("s1", "s2"))
    assert(got.count() == 2)
    assert(got.filter(col("is_current") === 1)
      .select("s2").as[Int].head() == 6)
  }

  test("applyChangelog: latest wins, tombstone deletes, later insert resurrects") {
    val log = Seq(
      (1L, 1L, "I", 10.0),
      (1L, 2L, "U", 11.0),  // key 1 -> 11.0
      (2L, 1L, "I", 20.0),
      (2L, 2L, "D", 0.0),   // key 2 deleted
      (3L, 1L, "I", 30.0),
      (3L, 2L, "D", 0.0),
      (3L, 3L, "I", 31.0)   // key 3 resurrected after tombstone
    ).toDF("k", "v", "op", "x")
    val got = Scd.applyChangelog(log, Seq("k"), "v", "op", Seq("x"))
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toList
    assert(got == List((1L, 2L, 11.0), (3L, 3L, 31.0)))
  }

  test("applyChangelog supports composite keys") {
    val log = Seq(
      (1L, "x", 1L, "I", 1.0),
      (1L, "y", 1L, "I", 2.0),
      (1L, "x", 2L, "D", 0.0)
    ).toDF("k1", "k2", "v", "op", "x")
    val got = Scd.applyChangelog(log, Seq("k1", "k2"), "v", "op", Seq("x"))
    assert(got.select("k2").as[String].collect().toList == List("y"))
  }

  test("applyChangelog plan is a single aggregate — no window, no extra shuffle") {
    val log = Seq((1L, 1L, "I", 1.0)).toDF("k", "v", "op", "x")
    val plan = Scd.applyChangelog(log, Seq("k"), "v", "op", Seq("x"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "compaction must not sort histories")
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") <= 1,
      s"expected at most one shuffle, got plan:\n$plan")
  }
}
