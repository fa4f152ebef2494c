package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl-scale dedup — the normalization pass a
  * CommonCrawl-style pipeline runs before grouping by page identity
  * (cf. `/root/reference/extract/commoncrawl_scraper.py`'s URL handling;
  * the reference dedups on raw `url` — canonicalization is the
  * engine-side generalization that collapses scheme/www/fragment/
  * param-order variants).
  *
  * Entirely builtin column expressions (regexp + split_part + array_sort)
  * so the whole pass stays inside whole-stage codegen, map-only, and is
  * reproducible in any SQL engine with the same primitives — the q87
  * oracle re-derives it in DuckDB. Regexes stay in the java∩RE2 subset
  * (no lookaround) for byte-exact cross-engine parity. */
object Urls {

  /** Canonical form: lowercase; scheme and `www.` stripped; fragment
    * dropped; query params sorted byte-wise; trailing slashes on the
    * path trimmed. `?` is re-emitted only when a query string exists. */
  def canonicalizeUrl(url: Column): Column = {
    val u = lower(trim(url))
    val noScheme = regexp_replace(u, "^https?://", "")
    val noWww = regexp_replace(noScheme, "^www\\.", "")
    val noFrag = regexp_replace(noWww, "#.*$", "")
    val path = regexp_replace(split_part(noFrag, lit("?"), lit(1)), "/+$", "")
    val qs = split_part(noFrag, lit("?"), lit(2))
    val sortedQs = concat_ws("&", array_sort(split(qs, "&")))
    concat(path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), sortedQs)))
  }
}
