package graft

import org.apache.spark.sql.functions._
import graft.ext.Boilerplate
import graft.functions.HtmlBlocks
import org.scalacheck.{Gen, Prop, Test => SCTest}

class BoilerplateSpec extends SparkSpecBase {

  import HtmlBlocks.html_blocks

  private def blocksOf(html: String): Seq[(String, String, Int, Int, Int)] = {
    import spark.implicits._
    Seq(html).toDF("html").select(explode(html_blocks(col("html"))).as("b"))
      .select(col("b.tag"), col("b.text"), col("b.n_chars"),
        col("b.link_chars"), col("b.n_words"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getInt(4))).toSeq
  }

  test("block segmentation on a realistic page: order, nesting, inline " +
      "stripping, whitespace normalization") {
    val html =
      """<!DOCTYPE html><html><head><title> My   Page </title>
        |<style>p { color: red }</style></head><body>
        |<nav><a href="/">Home</a> | <a href="/x">X</a></nav>
        |<article><h1>A <b>bold</b> headline</h1>
        |<p>First   paragraph with <i>inline</i> <a href="/l">a link</a>
        |here.</p>
        |<p>Second one.</p></article>
        |<script>var x = "<p>not a block</p>";</script>
        |<footer>(c) 2024</footer></body></html>""".stripMargin
    val got = blocksOf(html)
    // article closes AFTER its children; its own text is just whitespace
    assert(got.map(_._1) ==
      Seq("title", "nav", "h1", "p", "p", "article", "footer"))
    assert(got(0)._2 == "My Page")
    assert(got(1) == (("nav", "Home | X", 6, 5, 3)))
    assert(got(2)._2 == "A bold headline")
    assert(got(3)._2 == "First paragraph with inline a link here.")
    assert(got(3)._4 == "alink".length) // link_chars: non-ws inside <a>
    assert(got(4) == (("p", "Second one.", 10, 0, 2)))
    assert(got(5)._2 == "") // article's own (non-child) text
    assert(got(6)._2 == "(c) 2024")
  }

  test("tag soup never throws and follows the documented rules") {
    // unclosed blocks close at EOF innermost-first; stray closes are
    // ignored; a bare '<' is literal text; unterminated tags drop the
    // tail; void/self-closing tags never open blocks
    assert(blocksOf("<p>open forever") == Seq(("p", "open forever", 11, 0, 2)))
    assert(blocksOf("</p>stray<p>ok</p>") == Seq(("p", "ok", 2, 0, 1)))
    assert(blocksOf("<p>a < b and c</p>") ==
      Seq(("p", "a < b and c", 7, 0, 5)))
    assert(blocksOf("<p>kept<div") == Seq(("p", "kept", 4, 0, 1)))
    assert(blocksOf("<p>x<br>y<hr/>z</p>") == Seq(("p", "xyz", 3, 0, 1)))
    assert(blocksOf("<div><p>inner</div>more") ==
      Seq(("p", "inner", 5, 0, 1), ("div", "", 0, 0, 0)))
    assert(blocksOf("<!-- <p>comment</p> --><p>real</p>") ==
      Seq(("p", "real", 4, 0, 1)))
    assert(blocksOf("") == Seq())
    assert(blocksOf("no tags at all") == Seq())
  }

  test("html_blocks never throws on arbitrary input (tag-soup fuzz)") {
    val soup = Gen.listOf(Gen.oneOf(
      Gen.oneOf("<p>", "</p>", "<div>", "</div>", "<a href='x'>", "</a>",
        "<script>", "</script>", "<br>", "<", ">", "<!--", "-->", "<x/>",
        "</nav>", "<footer>"),
      Gen.alphaStr.map(_.take(8)))).map(_.mkString(" "))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(soup) { h =>
        HtmlBlocks.compute(
          org.apache.spark.unsafe.types.UTF8String.fromString(h)) != null
      })
    assert(res.passed, res.status.toString)
  }

  test("classification gates: chrome by tag, link density 0.3 boundary, " +
      "short-block gate at 5 words") {
    import spark.implicits._
    val cases = Seq(
      // chrome beats everything, even long fluent text
      (1L, "<nav>a perfectly fluent sentence of many words here</nav>"),
      // exactly AT the 0.3 boundary is NOT link-dense: 3 of 10 chars
      (2L, "<p><a href='x'>abc</a> d ef gh ij</p>"),
      // just over the boundary: 4 of 10 non-ws chars linked
      (3L, "<p><a href='x'>abcd</a> d ef gh i</p>"),
      // 4 words -> short; 5 words -> content
      (4L, "<p>one two three four</p>"),
      (5L, "<p>one two three four five</p>"))
      .toDF("doc_id", "html")
    val got = Boilerplate.extractContentOf(cases).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap // (chrome, link_dense, short, content)
    assert(got(1L) == ((1L, 0L, 0L, 0L)))
    assert(got(2L) == ((0L, 0L, 0L, 1L)), "density == 0.3 must pass")
    assert(got(3L) == ((0L, 1L, 0L, 0L)), "density > 0.3 must drop")
    assert(got(4L) == ((0L, 0L, 1L, 0L)))
    assert(got(5L) == ((0L, 0L, 0L, 1L)))
  }

  test("extraction golden on a real page shape: main text is exactly the " +
      "content paragraphs in document order") {
    import spark.implicits._
    val html =
      """<html><head><title>Widget Review</title></head><body>
        |<nav><a href="/">Home</a> <a href="/r">Reviews</a></nav>
        |<div><a href="/a">Ad one here</a> <a href="/b">Ad two here</a></div>
        |<p>The widget arrived quickly and works exactly as described.</p>
        |<p>Battery life is outstanding for the price point offered.</p>
        |<p>Read more</p>
        |<footer>Copyright</footer></body></html>""".stripMargin
    val got = Boilerplate.extractContentOf(
      Seq((9L, html)).toDF("doc_id", "html")).head()
    assert(got.getLong(1) == 7L) // title, nav, div, 3×p, footer
    assert(got.getString(6) ==
      "The widget arrived quickly and works exactly as described. " +
      "Battery life is outstanding for the price point offered.")
  }

  test("q123 composition: synthesized farms/short tails classified as " +
      "derived analytically, and the whole plan is one narrow map") {
    import spark.implicits._
    // 47 tokens -> paragraphs of 20/20/7; doc_id 3: farm at i where
    // (3 + i) % 5 == 0 -> i = 2; tail (7 tokens) is content
    val text = (1 to 47).map(i => s"w$i").mkString(" ")
    val out = Boilerplate.extractContentOf(Boilerplate.synthesizeHtmlOf(
      Seq((3L, text)).toDF("doc_id", "text"))).head()
    assert(out.getLong(1) == 7L)       // 3 paragraphs + 4 chrome/div blocks
    assert(out.getLong(2) == 3L)       // title, nav, footer
    assert(out.getLong(3) == 2L)       // subscribe div + farm paragraph 2
    assert(out.getLong(4) == 0L)
    assert(out.getLong(5) == 2L)       // paragraphs 1 and 3
    assert(out.getString(6) ==
      ((1 to 20) ++ (41 to 47)).map(i => s"w$i").mkString(" "))
    // 4-token doc, non-farm -> single short paragraph, empty main text
    val tiny = Boilerplate.extractContentOf(Boilerplate.synthesizeHtmlOf(
      Seq((2L, "a b c d")).toDF("doc_id", "text"))).head()
    assert(tiny.getLong(4) == 1L && tiny.getLong(5) == 0L)
    assert(tiny.getString(6) == "")
    // plan shape: the sort-free composition plans ZERO exchanges
    val p = Boilerplate.extractContentOf(Boilerplate.synthesizeHtmlOf(
        Tables(spark, sf0001, "documents").select(col("doc_id"), col("text"))))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(800))
    // registered entry: exactly the one deterministic output sort
    val pReg = Boilerplate.boilerplateExtract(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("rangepartitioning".r.findAllIn(pReg).length == 1, pReg.take(800))
  }

  // ---- q131 markup metadata ----------------------------------------------

  test("extractMetadataOf: title, first h1, heading count and ordered " +
      "outline; missing pieces come back empty, soup never throws") {
    import spark.implicits._
    val page = """<html><head><title>My Page</title></head><body>
      <h2>Early section</h2><p>body text here</p>
      <h1>Main Heading</h1><h3>Sub point</h3>
      <h1>Second H1</h1></body></html>"""
    val r = Boilerplate.extractMetadataOf(
      Seq((1L, page)).toDF("doc_id", "html")).head()
    assert(r.getAs[String]("title") == "My Page")
    assert(r.getAs[String]("first_h1") == "Main Heading")
    assert(r.getAs[Long]("n_headings") == 4L)
    assert(r.getAs[String]("outline") ==
      "h2:Early section | h1:Main Heading | h3:Sub point | h1:Second H1")
    // no title, no headings, tag soup
    val bare = Boilerplate.extractMetadataOf(
      Seq((2L, "<p>just text</p><h2 unclosed"), (3L, "no markup at all"))
        .toDF("doc_id", "html")).orderBy("doc_id").collect()
    assert(bare(0).getAs[String]("title") == "")
    assert(bare(0).getAs[String]("first_h1") == "")
    assert(bare(0).getAs[Long]("n_headings") == 0L)
    assert(bare(0).getAs[String]("outline") == "")
    assert(bare(1).getAs[Long]("n_headings") == 0L)
    // q131 plan: one narrow map + the registered output sort only
    val p = Boilerplate.extractMetadataOf(Boilerplate.synthesizeOutlinedHtmlOf(
        Tables(spark, sf0001, "documents").select(col("doc_id"), col("text"))))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(800))
  }

  test("q132 composition: the block parse runs once (checkpointed), " +
      "and the verdict flags planted dups and thin docs") {
    import spark.implicits._
    // ids 5/10 share text AND farm phase (both 0 mod 5) -> same
    // extraction -> the higher id is the dup; id 7 is too thin to keep
    val body = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq((5L, body), (10L, body), (7L, "too short to pass"))
      .toDF("doc_id", "text")
    val html = Boilerplate.synthesizeLinkedHtmlOf(docs)
    val got = graft.ext.CrawlPipeline.crawlPipelineOf(html)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(!got(5L)._2 && got(10L)._2, s"dup flags wrong: $got")
    assert(!got(7L)._2 && !got(7L)._3) // thin: not a dup, not kept
    assert(got(5L)._1 == got(10L)._1)  // same extraction
    // the composed plan re-parses nothing: over a REAL (non-local,
    // non-foldable) source, html_blocks appears in the extraction plan,
    // and the composed plan — whose extraction is checkpointed — never
    // contains it again
    val corpusHtml = Boilerplate.synthesizeLinkedHtmlOf(
      Tables(spark, sf0001, "documents").select(col("doc_id"), col("text")))
    val extPlan = Boilerplate.extractContentOf(corpusHtml)
      .queryExecution.executedPlan.toString.toLowerCase
    assert("html_blocks".r.findAllIn(extPlan).length >= 1, extPlan.take(800))
    val composed = graft.ext.CrawlPipeline.crawlPipelineOf(corpusHtml)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!composed.contains("html_blocks"),
      "composed plan re-parses markup instead of reading the checkpoint")
  }

  // ---- q124 link graph ----------------------------------------------------

  test("html_links: attribute forms, order, duplicates, script/comment " +
      "exclusion, soup safety") {
    import spark.implicits._
    def links(h: String): Seq[String] =
      Seq(h).toDF("html")
        .select(explode(graft.functions.HtmlLinks.html_links(col("html")))
          .as("l"))
        .collect().map(_.getString(0)).toSeq
    assert(links("""<a href="/x">a</a><a href='/y'>b</a><a href=/z>c</a>""")
      == Seq("/x", "/y", "/z"))
    assert(links("""<a HREF="/up">u</a> <a data-href="/no" href="/yes">v</a>""")
      == Seq("/up", "/yes"))
    assert(links("""<a href="/dup">1</a><a href="/dup">2</a>""")
      == Seq("/dup", "/dup")) // duplicates preserved, caller decides
    assert(links("""<a class="btn">no href</a><a href="">empty</a>""")
      == Seq())
    assert(links("""<script>var a='<a href="/ghost">';</script>
        <!-- <a href="/gone">x</a> --><a href="/real">r</a>""")
      == Seq("/real"))
    assert(links("""<a href="/open""") == Seq()) // unterminated tag
    // 'href' inside another attribute's VALUE is not an attribute name:
    // attributes parse left-to-right with quoted values consumed whole
    assert(links("""<a title="see href = bad" href="/x">v</a>""")
      == Seq("/x"))
    assert(links("""<a title="no href here">v</a>""") == Seq())
    assert(links("""<a alt='href ="/q"' href=/real>v</a>""") == Seq("/real"))
    // duplicate attribute: first occurrence wins (browser behavior),
    // and a valueless bare href IS that first occurrence
    assert(links("""<a href="/first" href="/second">v</a>""")
      == Seq("/first"))
    assert(links("""<a href href="/later">v</a>""") == Seq())
  }

  test("synthesis normalizes degenerate text: multi-space and empty " +
      "input classify identically to their single-spaced forms") {
    import spark.implicits._
    // double/triple spaces collapse: same tokens as the clean twin, so
    // the farm paragraph stays link-dense (empty anchor slots would have
    // zero visible words and flip the verdict to short)
    val messy = (1 to 24).map(i => s"w$i").mkString("  ") + "   "
    val clean = (1 to 24).map(i => s"w$i").mkString(" ")
    val Seq(m, c) = Boilerplate.extractContentOf(Boilerplate.synthesizeHtmlOf(
        Seq((4L, messy), (104L, clean)).toDF("doc_id", "text")))
      .orderBy("doc_id").collect().toSeq
    // doc 4 and 104 share (doc_id % 5), so farm positions agree
    assert((1 to 6).map(m.get) == (1 to 6).map(c.get))
    // empty text: zero paragraphs, chrome-only markup, empty main text
    val e = Boilerplate.extractContentOf(Boilerplate.synthesizeHtmlOf(
      Seq((7L, "")).toDF("doc_id", "text"))).head()
    assert(e.getLong(1) == 4L && e.getLong(5) == 0L && e.getString(6) == "")
  }

  test("linkGraphOf degrees on a hand-built graph, dangling and " +
      "external links counted apart") {
    import spark.implicits._
    val pages = Seq(
      (1L, """<p><a href="/doc/2">x</a> <a href="/doc/2">x</a>
              <a href="/doc/99">gone</a> <a href="/about">ext</a></p>"""),
      (2L, """<p><a href="/doc/1">back</a></p>"""),
      (3L, """<p>no links at all</p>""")).toDF("doc_id", "html")
    val got = graft.ext.Boilerplate.linkGraphOf(pages).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    // doc 1: /doc/2 twice counts ONCE for out_degree; /doc/99 dangles;
    // /about is external; in_degree from doc 2's backlink
    assert(got(1L) == ((1L, 1L, 1L, 1L)))
    // doc 2: one resolved out-link; in_degree 2 (doc 1 linked twice —
    // edges, not distinct sources)
    assert(got(2L) == ((1L, 0L, 0L, 2L)))
    assert(got(3L) == ((0L, 0L, 0L, 0L)))
  }

  test("extracted link edges compose into PageRank: the all-backlinked " +
      "hub outranks everyone; q124's plan keeps one sort, no cartesian") {
    import spark.implicits._
    val pages = Seq(
      (1L, """<p><a href="/doc/2">x</a></p>"""),
      (2L, """<p><a href="/doc/1">x</a></p>"""),
      (3L, """<p><a href="/doc/1">x</a> <a href="/doc/9">dangle</a></p>"""),
      (4L, """<p><a href="/doc/1">x</a></p>""")).toDF("doc_id", "html")
    val edges = graft.ext.Boilerplate.linkEdgesOf(pages)
    assert(edges.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (2L, 1L), (3L, 1L), (4L, 1L))) // /doc/9 dangles out
    val ranks = graft.ops.PageRank.pageRankOf(edges, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks.keySet == Set(1L, 2L, 3L, 4L))
    assert(ranks.values.forall(_ > 0))
    assert(ranks(1L) > ranks(2L) && ranks(1L) > ranks(3L) &&
      ranks(1L) > ranks(4L), s"hub must outrank leaves: $ranks")
    // q124 registered plan: exactly one global sort (the output ORDER
    // BY), and never a cartesian product
    val p = graft.ext.Boilerplate.linkGraph(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("rangepartitioning".r.findAllIn(p).length == 1, p.take(800))
    assert(!p.contains("Cartesian"), p.take(800))
  }

  test("q124 synthesis contract: three /doc/ anchors per document and " +
      "the analytic external-link count") {
    import spark.implicits._
    // 47 tokens, doc_id 3 -> farm at paragraph 2 (20 tokens): ext links
    // = 6 chrome + 20 farm anchors
    val text = (1 to 47).map(i => s"w$i").mkString(" ")
    val row = graft.ext.Boilerplate.linkGraphOf(
      graft.ext.Boilerplate.synthesizeLinkedHtmlOf(
        Seq((3L, text)).toDF("doc_id", "text"))).head()
    // dst = (3*131 + 97j) % 1000 = {490, 587, 684}; none is doc 3 ->
    // out candidates all dangle (single-doc corpus), in_degree 0
    assert(row.getLong(1) == 0L && row.getLong(2) == 3L)
    assert(row.getLong(3) == 26L)
    assert(row.getLong(4) == 0L)
  }
}
