package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Cleaning

/** S2–S5 — the Common Crawl extraction chain (SURVEY.md §2.1), re-expressed
  * over a DataFrame of (url, html) rows. The reference fetches one page per
  * HTTP round-trip serially (commoncrawl_scraper.py:211-222); here fetching
  * is a pluggable per-partition stage ([[Fetcher]]) and all field
  * extraction (F1–F8, F15) is codegen'd column expressions, so the parse of
  * billions of pages is a single map-only pass.
  */
object CrawlParse {

  /** HTML → visible-ish text: drop script/style blocks, strip tags,
    * collapse whitespace (the BeautifulSoup get_text stand-in,
    * commoncrawl_scraper.py:198-199). */
  def htmlText(html: Column): Column =
    Cleaning.cleanText(regexp_replace(
      regexp_replace(html,
        "(?is)<(script|style)[^>]*>.*?</\\1>", " "),
      "(?s)<[^>]+>", " "))

  /** `<title>` contents (commoncrawl_scraper.py:201-202). */
  def htmlTitle(html: Column): Column =
    Cleaning.cleanText(regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1))

  /** All `<script type="application/ld+json">` payloads as a JSON-array
    * string (commoncrawl_scraper.py:187-196 keeps them as an opaque blob). */
  def jsonLd(html: Column): Column =
    to_json(regexp_extract_all(html,
      lit("(?is)<script[^>]*application/ld\\+json[^>]*>(.*?)</script>"), lit(1)))

  /** Full parse: (url, html) → the 10-field stg.common_crawl_raw_companies
    * shape (commoncrawl_scraper.py:183-209, [[graft.model.CrawlCompany]]). */
  def parse(pages: DataFrame, urlCol: String = "url",
      htmlCol: String = "html"): DataFrame = {
    val url = col(urlCol)
    val text = htmlText(col(htmlCol))
    val domain = Cleaning.extractDomain(url)
    pages
      .filter(length(col(htmlCol)) > 0) // P3 — empty-fetch drop (:219-221)
      .select(
        url.as("url"),
        domain.as("domain"),
        Cleaning.extractCompanyName(domain).as("company_name"),
        Cleaning.extractAbn(text).as("abn"),
        htmlTitle(col(htmlCol)).as("title"),
        Cleaning.extractEmails(text).as("emails"),
        Cleaning.extractPhones(text).as("phones"),
        Cleaning.extractPostcode(text).as("postcode"),
        jsonLd(col(htmlCol)).as("structured_data"),
        Cleaning.snippet(text).as("snippet"))
  }

  /** S4 — WARC record point-fetch boundary. The reference issues one HTTP
    * Range request per index row (commoncrawl_scraper.py:167-181); at scale
    * this is an I/O-bound `mapPartitions` fan-out with a pooled client per
    * partition. Tests inject a deterministic stub; a real implementation
    * supplies an HTTP-backed Fetcher. */
  trait Fetcher extends Serializable {
    /** Return the page body for (warcFile, offset, length), or "" on error
      * (errors drop the row downstream, :219-221). */
    def fetch(warcFile: String, offset: Long, length: Long): String
  }

  /** §3.2 composition — the whole Common Crawl entry point as one lazy
    * DAG: index rows → per-partition WARC fetch → field extraction →
    * stg.common_crawl_raw_companies shape. (The reference runs this as a
    * serial driver loop with one HTTP round-trip per page,
    * commoncrawl_scraper.py:211-222.) */
  def ingest(index: DataFrame, fetcher: Fetcher): DataFrame =
    parse(fetchPages(index, fetcher))

  /** Run the fetch stage: index rows (url, warc_filename, offset, length) →
    * (url, html) via per-partition fetcher fan-out. */
  def fetchPages(index: DataFrame, fetcher: Fetcher): DataFrame = {
    val spark = index.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("url", StringType), StructField("html", StringType)))
    val rdd = index.select(col("url").cast("string"),
        col("warc_filename").cast("string"),
        col("offset").cast("long"), col("length").cast("long"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          Row(r.getString(0), fetcher.fetch(r.getString(1), r.getLong(2), r.getLong(3)))
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
