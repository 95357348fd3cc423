package graft

import org.apache.spark.sql.DataFrame
import graft.ops.Triangles

/** Value gates for degree-ordered triangle counting (ops/Triangles):
  * known small graphs, each-triangle-once pivot uniqueness, and
  * hub-orientation behavior — beyond the q104 oracle row. */
class TrianglesSpec extends SparkSpecBase {

  import spark.implicits._

  private def edges(es: (Long, Long)*): DataFrame =
    es.toDF("a", "b")

  private def triples(df: DataFrame): Set[(Long, Long, Long)] =
    Triangles.triangleTriplesOf(df)
      .as[(Long, Long, Long)].collect().toSet

  test("counts known graphs: K4 has 4 triangles, a bowtie 2, a path 0") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    assert(triples(k4).size == 4)
    val bowtie = edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (3L, 5L))
    assert(triples(bowtie).size == 2)
    val path = edges((1L, 2L), (2L, 3L), (3L, 4L))
    assert(triples(path).isEmpty)
  }

  test("each triangle appears exactly once, as an unordered node set") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val sets = triples(k4).toSeq
      .map { case (p, x, y) => Set(p, x, y) }
    assert(sets.distinct.size == sets.size, "a triangle was double-counted")
    assert(sets.toSet == Set(Set(1L, 2L, 3L), Set(1L, 2L, 4L),
      Set(1L, 3L, 4L), Set(2L, 3L, 4L)))
  }

  test("a hub star has no triangles; hub out-degree stays bounded by orientation") {
    // star: hub 0 connected to 1..40, plus one rim edge closing one triangle
    val star = (1L to 40L).map(i => (0L, i)) :+ ((1L, 2L))
    val t = triples(edges(star: _*))
    assert(t.size == 1 && t.head.productIterator.toSet == Set(0L, 1L, 2L))
    // degree orientation points rim -> hub (hub outranks everyone), so
    // the hub contributes ZERO wedges despite degree 40
    val o = Triangles.orientedOf(edges(star: _*))
    assert(o.filter(org.apache.spark.sql.functions.col("u") === 0L)
      .count() == 0)
  }
}
