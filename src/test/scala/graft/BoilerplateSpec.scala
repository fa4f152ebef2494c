package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CrawlParse

/** Main-content extraction (q182): Kohlschütter block segmentation +
  * the boilerpipe NumWordsRules tree on hand-built pages — nav, sidebar,
  * and footer drop; the article survives; mainContent stitches kept
  * blocks in document order; and the optional-stage composition in front
  * of the curation gates stops scoring boilerplate. */
class BoilerplateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val article =
    "The quarterly report shows revenue grew by twelve percent across " +
      "all regions while operating costs stayed flat, a combination the " +
      "board has not seen in six years of published accounts."
  private val para2 =
    "Management attributes the margin expansion to the logistics " +
      "overhaul completed last spring and expects the effect to persist " +
      "through at least two more reporting cycles."

  private val page =
    "<html><head><title>Acme Q3</title><script>track();</script>" +
      "<style>.x{color:red}</style></head><body>" +
      "<nav><a href=/>Home</a> <a href=/n>News</a> <a href=/i>IR</a> " +
      "<a href=/c>Contact</a></nav>" +
      s"<article><p>$article</p><p>$para2</p></article>" +
      "<aside><a href=/r1>Related story one</a> " +
      "<a href=/r2>Related story two</a> <a href=/r3>More</a></aside>" +
      "<footer><a href=/t>Terms</a> <a href=/p>Privacy</a> " +
      "<a href=/s>Sitemap</a> © Acme</footer></body></html>"

  private def features(html: String) =
    CrawlParse.blockFeatures(Seq(("p1", html)).toDF("url", "html"))
      .orderBy("block_idx").collect()

  test("nav, link-list sidebar, and footer are boilerplate; both article " +
      "paragraphs are content; script/style never surface") {
    val rows = features(page)
    val byText = rows.map(r => r.getString(2) -> r.getBoolean(6)).toMap
    assert(byText.keys.forall(t => !t.contains("track") && !t.contains("color")))
    assert(!byText("Home News IR Contact"), "nav kept")
    assert(byText(article), "first article paragraph dropped")
    assert(byText(para2), "second article paragraph dropped")
    assert(!byText("Related story one Related story two More"), "sidebar kept")
    assert(rows.filter(!_.getBoolean(6)).map(_.getString(2))
      .exists(_.contains("Terms")), "footer kept")
  }

  test("link density counts anchor words against block words; inline " +
      "anchors do not split blocks") {
    val html = "<html><body><p>only two of these ten words are " +
      "<a href=/x>a link</a> here</p></body></html>"
    val rows = features(html)
    val blk = rows.find(_.getString(2).startsWith("only two")).get
    assert(blk.getLong(3) == 10L, s"n_words ${blk.getLong(3)}")
    assert(blk.getLong(4) == 2L, s"n_anchor_words ${blk.getLong(4)}")
    assert(math.abs(blk.getDouble(5) - 2.0 / 10) < 1e-12)
  }

  test("HTML comments are stripped whole, even when they contain '>' " +
      "(ADVICE r14: commented-out markup must not leak into features)") {
    val html = "<html><body><p>real words here</p>" +
      "<!-- if a > b then commented leak words --><p>more real text " +
      "follows this paragraph boundary marker</p>" +
      "<!-- <div>old nav</div> --></body></html>"
    val rows = features(html)
    val texts = rows.map(_.getString(2))
    assert(texts.forall(t => !t.contains("leak") && !t.contains("old nav")),
      s"comment text leaked into blocks: ${texts.mkString("|")}")
    assert(texts.exists(_.startsWith("real words")) &&
      texts.exists(_.startsWith("more real")))
  }

  test("short text sandwiched between link walls needs a long neighbor " +
      "to survive (the prev-link-density branch)") {
    def mk(tail: String) =
      "<html><body><div><a href=/1>one two three four five six</a></div>" +
        "<p>short caption here</p>" + tail + "</body></html>"
    // prev block is all links (ld 1 > 0.555556), curr 3 words ≤ 40:
    // keep iff next block exceeds 17 words
    val withLong = features(mk(s"<p>$article</p>"))
    val withShort = features(mk("<p>tiny tail</p>"))
    assert(withLong.find(_.getString(2) == "short caption here")
      .get.getBoolean(6), "caption before a long article should survive")
    assert(!withShort.find(_.getString(2) == "short caption here")
      .get.getBoolean(6), "caption before a short tail should drop")
  }

  test("S5 extractors over main content stop matching footer noise " +
      "but keep body facts (the q185 parity, VERDICT r14 item 3)") {
    val body = "real article body with enough words to clear the " +
      "sixteen word keep threshold easily visit us at postcode 3142 " +
      "or mail sales@body.example.com.au for details today ok"
    // the short note between body and footer matters: boilerpipe keeps
    // a 13-word footer whose PREV block is long (prev_words > 4)
    val html = "<html><body><p>" + body + "</p><p>Short note here</p>" +
      "<div><a href=/t>Terms</a> <a href=/p>Privacy policy</a> " +
      "Copyright 2007 Example Corp ABN 51 824 753 556 " +
      "webmaster@example.com</div></body></html>"
    val pages = Seq(("p1", html)).toDF("url", "html")
    val whole = CrawlParse.htmlText(col("html"))
    val main = CrawlParse.mainContent(pages)
    val w = pages.select(
      graft.functions.Cleaning.extractPostcode(whole),
      graft.functions.Cleaning.extractAbn(whole),
      graft.functions.Cleaning.extractEmails(whole)).head()
    val m = main.select(
      graft.functions.Cleaning.extractPostcode(col("main_text")),
      graft.functions.Cleaning.extractAbn(col("main_text")),
      graft.functions.Cleaning.extractEmails(col("main_text"))).head()
    // whole-page: body facts win where present, but footer noise leaks
    // into emails; main-content: ONLY the body facts
    assert(w.getString(0) == "3142" && m.getString(0) == "3142")
    assert(w.getString(1) == "51824753556",
      "whole-page ABN should scrape the footer site ABN here")
    assert(m.getString(1) == null,
      "main content must not surface the footer ABN")
    assert(w.getSeq[String](2) ==
      Seq("sales@body.example.com.au", "webmaster@example.com"))
    assert(m.getSeq[String](2) == Seq("sales@body.example.com.au"))
  }

  test("mainContent stitches kept blocks in document order") {
    val main = CrawlParse.mainContent(Seq(("p1", page)).toDF("url", "html"))
      .collect()
    assert(main.length == 1)
    val text = main.head.getString(1)
    assert(text.contains(article) && text.contains(para2))
    assert(text.indexOf(article) < text.indexOf(para2), "order lost")
    assert(!text.contains("Home") && !text.contains("Privacy"))
  }

  test("optional stage before the curation gates: gating main content " +
      "instead of whole-page text stops boilerplate from polluting the " +
      "quality signals") {
    val pages = Seq(("p1", page)).toDF("url", "html")
    val whole = CrawlParse.htmlText(col("html"))
    val stats = pages.select(
        size(split(whole, " ")).as("whole_words"))
      .head()
    val mainWords = CrawlParse.mainContent(pages)
      .select(size(split(col("main_text"), " "))).head().getInt(0)
    // the page's nav/sidebar/footer inflate the whole-page token count;
    // a Gopher-style length/stopword gate sees the article alone
    assert(mainWords < stats.getInt(0), "main content not smaller")
    val gated = operators.TextAnalysis.gopherQuality(
      CrawlParse.mainContent(pages).select(col("url").as("doc_id"),
        col("main_text").as("text")), "text", "doc_id")
    assert(gated.count() == 1)
  }
}
