package graft

import org.apache.spark.sql.functions._
import graft.ext.Boilerplate

/** Anchor-text extraction (q148): markup-soup goldens, agreement with
  * html_links on the shared href walk, and resolution classes on the
  * registered corpus. */
class HtmlAnchorsSpec extends SparkSpecBase {

  private def pairs(html: String): Seq[(String, String)] = {
    import spark.implicits._
    Seq((1L, html)).toDF("doc_id", "html")
      .select(explode(
        graft.functions.HtmlAnchors.html_anchors(col("html"))).as("p"))
      .select(col("p.href"), col("p.anchor"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  test("soup goldens: nested markup, comments, script regions, " +
      "implicit close, EOF close, empty text, whitespace collapse, " +
      "literal '<', href-less anchors") {
    assert(pairs("""<a href="/x">Hello <b>World</b></a>""")
      == Seq("/x" -> "Hello World"))
    assert(pairs("""<a href="/x">keep <!-- not this --> going</a>""")
      == Seq("/x" -> "keep going"))
    assert(pairs("""<a href="/x">a<script>var y = "hidden";</script>b</a>""")
      == Seq("/x" -> "ab"))
    // a new <a> implicitly closes the open one (browser behavior)
    assert(pairs("""<a href="/x">first <a href="/y">second</a>""")
      == Seq("/x" -> "first", "/y" -> "second"))
    // EOF closes an open anchor
    assert(pairs("""<p>pre</p><a href="/x">trailing text""")
      == Seq("/x" -> "trailing text"))
    assert(pairs("""<a href="/x"></a>""") == Seq("/x" -> ""))
    assert(pairs("<a href=\"/x\">  lots \n\t of   space  </a>")
      == Seq("/x" -> "lots of space"))
    // literal '<' is visible text (the siblings' rule)
    assert(pairs("""<a href="/x">3 < 4</a>""") == Seq("/x" -> "3 < 4"))
    // href-less anchors contribute nothing
    assert(pairs("""<a>nothing</a><a href="/x">yes</a>""")
      == Seq("/x" -> "yes"))
    // anchors inside script/comment regions are not scanned
    assert(pairs("""<script><a href="/no">x</a></script>""") == Nil)
    assert(pairs("""<!-- <a href="/no">x</a> -->""") == Nil)
  }

  test("href agreement: html_anchors extracts exactly html_links' " +
      "hrefs, in order, on the q124 linked corpus synthesis") {
    import spark.implicits._
    val html = Boilerplate.synthesizeLinkedHtmlOf(
      Tables(spark, sf0001, "documents")
        .select(col("doc_id"), col("text")))
    val links = html.select(col("doc_id"),
        graft.functions.HtmlLinks.html_links(col("html")).as("v"))
      .as[(Long, Seq[String])].collect().toMap
    val anchors = html.select(col("doc_id"),
        graft.functions.HtmlAnchors.html_anchors(col("html")).as("v"))
      .select(col("doc_id"), col("v.href").as("v"))
      .as[(Long, Seq[String])].collect().toMap
    assert(links.nonEmpty && links == anchors,
      "the two walks must agree on which hrefs exist and their order")
  }

  test("registered q148: internal resolved, internal dangling, and " +
      "external rows all occur; anchors carry the varied text") {
    val rows = Boilerplate.anchorText(spark, sf001).collect()
    assert(rows.length == 1600)
    val internal = rows.filter(_.getAs[String]("href").startsWith("/doc/"))
    assert(internal.exists(r => !r.isNullAt(r.fieldIndex("dst_doc_id"))))
    assert(internal.exists(_.getAs[Boolean]("dangling")))
    val ext = rows.filter(_.getAs[String]("href").startsWith("https://"))
    assert(ext.nonEmpty &&
      ext.forall(r => r.isNullAt(r.fieldIndex("dst_doc_id")) &&
        !r.getAs[Boolean]("dangling")))
    assert(ext.forall(_.getAs[String]("anchor") == "external source"))
    assert(internal.forall(r =>
      r.getAs[String]("anchor").matches("topic \\d ?.*item \\d+")))
  }

  test("q149 anchor-term labels: counts recompute exactly from the " +
      "q148 rows; multi-source terms exist and n_sources <= n_mentions") {
    val anchors = Boilerplate.anchorText(spark, sf001).collect()
      .filter(r => !r.isNullAt(r.fieldIndex("dst_doc_id")))
    val want = anchors.flatMap { r =>
      r.getAs[String]("anchor").split(" ").filter(_.nonEmpty).map(t =>
        (r.getAs[Long]("dst_doc_id"), t, r.getAs[Long]("doc_id")))
    }
    val wantCounts = want.groupBy(t => (t._1, t._2)).map { case (k, v) =>
      k -> ((v.length.toLong, v.map(_._3).distinct.length.toLong))
    }
    val got = Boilerplate.anchorTerms(spark, sf001).collect()
      .map(r => (r.getAs[Long]("dst_doc_id"), r.getAs[String]("term")) ->
        ((r.getAs[Long]("n_mentions"), r.getAs[Long]("n_sources")))).toMap
    assert(got == wantCounts)
    assert(got.values.forall { case (m, s) => s <= m && s >= 1 })
    // the label-strength signal is non-degenerate: some term is used by
    // MORE THAN ONE distinct source
    assert(got.values.exists(_._2 > 1),
      "no multi-source anchor term at sf0.01 — synthesis too diverse")
  }
}
