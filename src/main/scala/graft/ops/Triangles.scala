package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed triangle counting by degree-ordered orientation — the
  * third graph primitive next to connected components
  * ([[graft.ext.Curate.dedupClusters]]) and the co-occurrence joins:
  * triangle density is the classic cohesion signal (spam/link-farm
  * detection, community strength, recommendation confidence).
  *
  * The naive triple-join counts every triangle 6 times and lets one
  * high-degree hub generate O(deg²) wedges. Degree-ordered orientation
  * (Suri & Vassilvitskii, WWW'11; Chiba–Nishizeki) fixes both: orient
  * every undirected edge from its lower-(degree, id) endpoint to the
  * higher one — a total order, so each triangle has EXACTLY one pivot
  * with two out-edges and is counted once, and every node's out-degree
  * is bounded by O(√m) regardless of its raw degree (a hub's million
  * neighbors almost all outrank it, so its wedge fanout collapses).
  *
  * Every stage is a keyed shuffle — degree aggregate, two orientation
  * joins, the wedge self-join on the pivot, a semi-join closing the
  * wedge against the oriented edge set. No cartesian, no broadcast
  * requirement, no driver state.
  */
object Triangles {

  /** Orient a distinct undirected edge list (columns `a`, `b`; a ≠ b)
    * by (degree, id). Output: (u, v, dv) — dv carried so the wedge
    * stage can order out-neighbors without re-joining degrees. */
  def orientedOf(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("n"))
      .unionAll(edges.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    edges
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"),
        when(aFirst, col("db")).otherwise(col("da")).as("dv"))
  }

  /** All triangles, one row each: (p, x, y) with p the unique pivot
    * and (x, y) its out-neighbor pair in orientation order. */
  def triangleTriplesOf(edges: DataFrame): DataFrame = {
    val o = orientedOf(edges).localCheckpoint(eager = false) // reused three times
    val e1 = o.select(col("u"), col("v").as("x"), col("dv").as("dx"))
    val e2 = o.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    val wedges = e1.join(e2, "u")
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
    wedges.join(o.select(col("u").as("x"), col("v").as("y")),
        Seq("x", "y"), "left_semi")
      .select(col("u").as("p"), col("x"), col("y"))
  }

  /** The shared q104/q105 graph: parts are adjacent iff some order in
    * the 1-in-7 order sample contains both (the sample keeps the
    * bench-scale graph at ~170k edges instead of the near-complete
    * 1.2M; the ALGORITHMS have no such need). One definition, used by
    * both Spark queries AND both oracles ([[CoPurchaseEdgesSql]]) — a
    * tuning change cannot silently desynchronize them. */
  def coPurchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") % 7 === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    li.select(col("l_orderkey"), col("l_partkey").as("a"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("b")),
        "l_orderkey")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** The co-purchase edge list as a session artifact — the graph BOTH
    * q104 (triangles) and q105 (PageRank) analyze: one derivation, two
    * algorithm consumers (the [[graft.SessionMemo]] shared-artifact
    * policy; each oracle still replays the self-join independently). */
  private[graft] def coPurchaseEdgesFor(spark: SparkSession,
      dir: String): DataFrame =
    graft.SessionMemo(spark, s"copurchase-edges:$dir") {
      coPurchaseEdges(spark, dir).localCheckpoint()
    }

  /** The same edge set as a DuckDB CTE body (named `e`). */
  val CoPurchaseEdgesSql: String =
    """e AS (SELECT DISTINCT x.l_partkey a, y.l_partkey b
         FROM lineitem x JOIN lineitem y
         ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
         WHERE x.l_orderkey % 7 = 0)"""

  /** q104: triangle participation in the part co-purchase graph — the
    * top-20 most clustered parts; each triangle credits all three
    * corners. */
  def q104Triangles(spark: SparkSession, dir: String): DataFrame = {
    triangleTriplesOf(coPurchaseEdgesFor(spark, dir))
      .select(explode(array(col("p"), col("x"), col("y"))).as("part"))
      .groupBy(col("part")).agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("n_triangles").desc, col("part"))
      .limit(20)
  }

  val q104Oracle: String =
    s"""WITH $CoPurchaseEdgesSql,
       deg AS (SELECT n, count(*) d FROM
         (SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
       o AS (SELECT
           CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
             THEN a ELSE b END u,
           CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
             THEN b ELSE a END v
         FROM e JOIN deg da ON da.n = a JOIN deg db ON db.n = b),
       tri AS (SELECT e1.u p, e1.v x, e2.v y
         FROM o e1 JOIN o e2 ON e1.u = e2.u
         JOIN deg d1 ON d1.n = e1.v JOIN deg d2 ON d2.n = e2.v
         WHERE (d1.d < d2.d OR (d1.d = d2.d AND e1.v < e2.v))
           AND EXISTS (SELECT 1 FROM o WHERE o.u = e1.v AND o.v = e2.v)),
       nodes AS (SELECT unnest([p, x, y]) AS part FROM tri)
       SELECT part, CAST(count(*) AS BIGINT) AS n_triangles
       FROM nodes GROUP BY 1 ORDER BY n_triangles DESC, part LIMIT 20"""
}
