package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synchronous label propagation — the fourth graph primitive next to
  * connected components ([[graft.ext.Curate.dedupClusters]]), triangle
  * counting ([[Triangles]]) and [[PageRank]]: communities in the
  * co-occurrence graph, the structure spam-farm and mirror-cluster
  * detection reads (a link farm is a dense community whose triangle
  * density q104 already measures; LPA names its members).
  *
  * Semantics (deterministic by construction, so engine and oracle can
  * agree bit for bit): labels start as node ids; each round, every
  * node simultaneously adopts the most frequent label among its
  * neighbors PLUS its own current label as one vote (the self-vote
  * damps the 2-cycle oscillation synchronous LPA is known for), ties
  * broken toward the smallest label. A fixed [[Rounds]] rounds — the
  * output is a deterministic snapshot of the propagation, not a
  * convergence claim (classic LPA has none to offer; community READS
  * should aggregate sizes, which stabilize much faster than member
  * labels).
  *
  * Scale: per round one (node-keyed) aggregate over the edge list —
  * the frame is edge-sized, labels are node-sized, and the per-node
  * argmax is a single max-of-struct aggregate (count desc, label asc
  * encoded as (c, −label)), NOT a window: no per-node sort, no
  * single-reducer funnel. Rounds are a fixed small constant, the
  * large-star/small-star budget argument. */
object LabelProp {

  /** Fixed synchronous rounds (the oracle unrolls exactly these — the
    * q105 fixed-iteration convention; community SIZES stabilize within
    * a few rounds even where member labels keep drifting). */
  val Rounds = 3

  /** Label table after [[Rounds]] synchronous rounds over a distinct
    * undirected edge list (columns `a`, `b`; a ≠ b). Nodes are the
    * edge endpoints. */
  def propagateOf(edges: DataFrame): DataFrame = {
    // materialized once, hash-partitioned on the per-round join key —
    // the q105 pattern: without the repartition every round re-shuffles
    // the edge-sized side; with it only the node-sized label frame
    // moves per round
    val adj = edges.select(col("a").as("n"), col("b").as("m"))
      .unionAll(edges.select(col("b").as("n"), col("a").as("m")))
      .repartition(col("m"))
      .localCheckpoint()
    var labels = adj.select(col("n").as("node")).distinct()
      .withColumn("lbl", col("node"))
    var r = 0
    while (r < Rounds) {
      val votes = adj
        .join(labels.select(col("node").as("m"), col("lbl")), Seq("m"))
        .select(col("n"), col("lbl"))
        .unionAll(labels.select(col("node").as("n"), col("lbl")))
        .groupBy(col("n"), col("lbl"))
        .agg(count(lit(1)).as("c"))
      labels = votes
        .groupBy(col("n"))
        .agg(max(struct(col("c"), (-col("lbl")).as("neg"))).as("best"))
        .select(col("n").as("node"), (-col("best.neg")).as("lbl"))
        .localCheckpoint()
      r += 1
    }
    labels
  }

  /** q187: communities of the part co-purchase graph — per node its
    * final label, plus the community size (a broadcast-joinable
    * label-count frame). ORDER BY = oracle determinism only. */
  def q187LabelProp(spark: SparkSession, dir: String): DataFrame = {
    val labels = propagateOf(
      Triangles.coPurchaseEdgesFor(spark, dir)).localCheckpoint()
    val sizes = labels.groupBy(col("lbl"))
      .agg(count(lit(1)).as("community_size"))
    labels.join(broadcast(sizes), Seq("lbl"))
      .select(col("node").as("part"), col("lbl").as("community"),
        col("community_size"))
      .orderBy(col("part"))
  }

  /** Oracle: the edge CTE shared with q104/q105, then [[Rounds]]
    * unrolled vote+argmax rounds (the oracle may window per node —
    * that is DuckDB's plan, not the engine's). */
  lazy val oracle: String = {
    val b = new StringBuilder
    b ++= s"""${Triangles.CoPurchaseEdgesSql},
       adj AS MATERIALIZED (SELECT a AS n, b AS m FROM e
         UNION ALL SELECT b AS n, a AS m FROM e),
       lbl_0 AS MATERIALIZED (SELECT DISTINCT n AS node, n AS lbl
         FROM adj)"""
    for (r <- 1 to Rounds) {
      b ++= s""",
       votes_$r AS (SELECT n, lbl, CAST(count(*) AS BIGINT) AS c FROM (
           SELECT adj.n, l.lbl FROM adj
           JOIN lbl_${r - 1} l ON l.node = adj.m
           UNION ALL SELECT node AS n, lbl FROM lbl_${r - 1})
         GROUP BY 1, 2),
       lbl_$r AS MATERIALIZED (SELECT n AS node, lbl FROM (
           SELECT n, lbl, row_number() OVER (PARTITION BY n
             ORDER BY c DESC, lbl) AS rn FROM votes_$r)
         WHERE rn = 1)"""
    }
    s"""WITH ${b.toString},
       sz AS (SELECT lbl, CAST(count(*) AS BIGINT) AS community_size
         FROM lbl_$Rounds GROUP BY 1)
       SELECT l.node AS part, l.lbl AS community, sz.community_size
       FROM lbl_$Rounds l JOIN sz ON sz.lbl = l.lbl
       ORDER BY part"""
  }
}
