/** Spark-native analytics engine with the query and data-processing
  * capabilities of the Firmable company-data pipeline, re-architected for
  * `org.apache.spark.sql` (SURVEY.md is the blueprint; §8 maps every
  * operator to its implementation and verification gate).
  *
  *  - [[graft.SparkEntry]] — driver contract: the query inventory and its
  *    DuckDB oracle twins ([[graft.OracleSql]])
  *  - [[graft.functions]] — cleaning/extraction column functions and the
  *    custom Catalyst kernels (similarity, checksum, simhash, title-case,
  *    group-MinHash aggregator, bottom-k aggregate)
  *  - [[graft.operators]] — match cascade, dedup (exact/LSH/incremental),
  *    ANN, text analysis, multimodal plumbing, skew tools, connected
  *    components, temporal joins, validation, sampling
  *  - [[graft.sources]] — ABR XML, Common Crawl parse chain, sinks
  *  - [[graft.streaming]] — windowed/stateful event streams
  *  - [[graft.pipeline]] — stg → pre_dwh → dwh orchestration
  *  - [[graft.plans]] — optimizer rules ([[graft.plans.SimilarityPrefilter]])
  *  - [[graft.GraftExtensions]] — SparkSessionExtensions installer
  */
package object graft
