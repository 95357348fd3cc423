package graft

import org.apache.spark.sql.DataFrame
import graft.ops.PageRank

/** Value gates for integer-arithmetic PageRank (ops/PageRank): exact
  * equality with a local reference implementation using the same
  * micro-unit floor arithmetic, plus structural sanity (hub dominance,
  * near-conserved mass) — beyond the q105 oracle row. */
class PageRankSpec extends SparkSpecBase {

  import spark.implicits._

  private val Scale = 1000000000000L

  /** The same fixed-point recurrence, computed single-threaded. */
  private def reference(edges: Seq[(Long, Long)], iterations: Int)
      : Map[Long, Long] = {
    val directed = edges ++ edges.map(e => (e._2, e._1))
    val outdeg = directed.groupBy(_._1).map { case (n, es) =>
      n -> es.size.toLong }
    val n = outdeg.size
    val base = Scale * 15L / (100L * n)
    var ranks = outdeg.map { case (node, _) => node -> Scale / n }
    (1 to iterations).foreach { _ =>
      val contribs = directed.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => ranks(src) / outdeg(src) }.sum
      }
      ranks = contribs.map { case (node, c) =>
        node -> (base + 85L * c / 100L) }
    }
    ranks
  }

  private def distributed(edges: Seq[(Long, Long)], iterations: Int)
      : Map[Long, Long] =
    PageRank.pageRankOf(edges.toDF("a", "b"), iterations)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches the local reference bit-for-bit on an irregular graph") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (1L, 5L), (5L, 6L), (6L, 7L), (2L, 7L), (7L, 8L))
    for (iters <- Seq(1, 3, 5))
      assert(distributed(g, iters) == reference(g, iters),
        s"diverged at $iters iterations")
  }

  test("a hub outranks its spokes and total mass stays within floor loss") {
    val star = (1L to 20L).map(i => (0L, i))
    val ranks = distributed(star, 3)
    val hub = ranks(0L)
    assert((1L to 20L).forall(i => hub > ranks(i)),
      s"hub should dominate: $ranks")
    val total = ranks.values.sum
    // each node floors twice per iteration; loss is micro-units, not %
    assert(total <= Scale && total > Scale * 99L / 100L,
      s"mass $total drifted too far from $Scale")
  }
}
