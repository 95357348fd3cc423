package graft

import org.apache.spark.sql.functions._

import graft.ops.LabelProp

/** Label propagation semantics on crafted graphs: cliques resolve to
  * one community each, bridges don't merge them, the self-vote keeps a
  * 2-cycle from oscillating forever, and the result is invariant under
  * input partitioning (the registered q187 is additionally pinned by
  * ParallelismSpec and the DuckDB oracle). */
class LabelPropSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], parts: Int = 3) =
    LabelProp.propagateOf(
        edges.toDF("a", "b").repartition(parts))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cliques joined by one bridge edge stay two communities, " +
      "each labeled by its smallest member") {
    // clique {1,2,3,4}, clique {10,11,12,13}, bridge 4-10
    val cl = (for {
      s <- Seq(Seq(1L, 2L, 3L, 4L), Seq(10L, 11L, 12L, 13L))
      a <- s; b <- s if a < b
    } yield (a, b)) :+ (4L -> 10L)
    val got = run(cl)
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_) == 1L))
    assert(Seq(10L, 11L, 12L, 13L).forall(got(_) == 10L))
  }

  test("the self-vote settles an isolated edge instead of oscillating") {
    // nodes 5-6: without the self-vote, synchronous LPA swaps labels
    // every round forever; with it, round 1 gives both (1 vote each →
    // tie → smaller label) the label 5, and it is stable after that
    val got = run(Seq((5L, 6L)))
    assert(got == Map(5L -> 5L, 6L -> 5L))
  }

  test("result is invariant under input partitioning") {
    val edges = for {
      s <- Seq(Seq(1L, 2L, 3L), Seq(7L, 8L, 9L), Seq(20L, 21L))
      a <- s; b <- s if a < b
    } yield (a, b)
    assert(run(edges, parts = 1) == run(edges, parts = 7))
  }

  test("the per-round argmax is a HashAggregate (the packed-decimal " +
      "key), never a struct-buffered SortAggregate, and equals the " +
      "struct form") {
    val votes = Seq(
      (1L, 10L, 3L), (1L, 2L, 3L), (1L, 99L, 1L), // tie -> smaller lbl
      (2L, 7L, 5L), (2L, 1L, 4L))
      .toDF("n", "lbl", "c")
    val got = LabelProp.argmaxLabel(votes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 7L))
    val plan = LabelProp.argmaxLabel(votes)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("sortaggregate"),
      "packed key must keep the per-round fold in HashAggregate")
    assert(!plan.contains("windowspecdefinition"))
    // a negative node id is outside the packed key's domain: refused
    // loudly, never silently mis-decoded
    val e = intercept[Exception] {
      LabelProp.propagateOf(Seq((-5L, 6L)).toDF("a", "b")).collect()
    }
    assert(e.getMessage.contains("negative node"))
  }
}
