package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Cleaning

/** S1 — ABR bulk-XML ingestion (SURVEY.md §2.1 S1), replacing the
  * reference's incremental lxml.iterparse loop
  * (/root/reference/extract/abr_parser.py:71-87) with Spark 4's native XML
  * source: `rowTag=ABR` streams elements per-partition with constant
  * memory, and the 50k-row insert batching (abr_parser.py:20,82) collapses
  * into the distributed writer.
  *
  * Field paths follow abr_parser.py:51-68:
  *   ABN text + @status + @ABNStatusFromDate,
  *   EntityType/EntityTypeText,
  *   MainEntity/NonIndividualName/NonIndividualNameText,
  *   MainEntity/BusinessAddress/AddressDetails/{State,Postcode}.
  * XML attributes surface as `_status`, `_ABNStatusFromDate` struct fields.
  */
object AbrXml {

  /** Read raw `<ABR>` rows from bulk XML file(s). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml")
      .option("rowTag", "ABR")
      .load(path)

  /** Project the nested XML rows into the flat stg.abr_raw_companies
    * shape ([[graft.model.AbrCompany]]), incl. the reference's address
    * synthesis (abr_parser.py:66) and yyyyMMdd date parse (:55). */
  def toStaging(raw: DataFrame): DataFrame = {
    // ABN element may carry text + attributes → struct with _VALUE;
    // tolerate both shapes (plain string when attributes are absent).
    val abnIsStruct = raw.schema("ABN").dataType
      .isInstanceOf[org.apache.spark.sql.types.StructType]
    val abn = if (abnIsStruct) col("ABN._VALUE").cast("string")
      else col("ABN").cast("string")
    val status = if (abnIsStruct) col("ABN._status").cast("string")
      else lit(null).cast("string")
    val statusDate = if (abnIsStruct) col("ABN._ABNStatusFromDate").cast("string")
      else lit(null).cast("string")
    val state = col("MainEntity.BusinessAddress.AddressDetails.State").cast("string")
    val pc = col("MainEntity.BusinessAddress.AddressDetails.Postcode").cast("string")
    raw.select(
      abn.as("abn"),
      col("MainEntity.NonIndividualName.NonIndividualNameText").cast("string")
        .as("entity_name"),
      col("EntityType.EntityTypeText").cast("string").as("entity_type"),
      status.as("entity_status"),
      Cleaning.synthesizeAddress(state, pc).as("address"),
      pc.as("postcode"),
      state.as("state"),
      Cleaning.parseAbrDate(statusDate).as("start_date"))
  }
}
