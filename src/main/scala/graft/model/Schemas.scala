package graft.model

import java.sql.{Date, Timestamp}

/** Typed layer boundaries (SURVEY.md §1): fixed schemas end-to-end — the
  * reference's pre_dwh all-TEXT type erasure
  * (/root/reference/transform/data_cleaning.py:122-128) is deliberately
  * rejected (SURVEY.md §1.3).
  */

/** stg.abr_raw_companies shape (/root/reference/extract/abr_parser.py:29-40). */
final case class AbrCompany(
    abn: String,
    entity_name: String,
    entity_type: String,
    entity_status: String,
    address: String,
    postcode: String,
    state: String,
    start_date: Date)

/** stg.common_crawl_raw_companies shape
  * (/root/reference/extract/commoncrawl_scraper.py:80-94). */
final case class CrawlCompany(
    url: String,
    domain: String,
    company_name: String,
    abn: String,
    title: String,
    emails: Seq[String],
    phones: Seq[String],
    postcode: String,
    structured_data: String,
    snippet: String)

/** pre_dwh cleaned ABR row (typed, not TEXT-erased). */
final case class CleanedAbr(
    abn: String,
    entity_name: String,
    entity_type: String,
    state: String,
    postcode: String)

/** pre_dwh cleaned crawl row. */
final case class CleanedCrawl(
    domain: String,
    company_name: String,
    abn: String,
    postcode: String)

/** dwh.dim_entity_match_company_data
  * (/root/reference/transform/entity_matching.py:39-55,
  * db/ddl_scripts.sql:76-91; FIXTURES.md B4). */
final case class EntityMatch(
    crawl_domain: String,
    crawl_company_name: String,
    crawl_abn: String,
    abr_abn: String,
    abr_company_name: String,
    abr_entity_type: String,
    abr_state: String,
    abr_postcode: String,
    match_method: String,
    match_score: java.math.BigDecimal,
    match_confidence: String,
    created_at: Timestamp,
    creation_dt: Timestamp)
