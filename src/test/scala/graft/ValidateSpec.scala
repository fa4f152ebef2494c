package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Validate

class ValidateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  test("company rules split valid rows from quarantine with reasons") {
    import spark.implicits._
    val df = Seq(
      ("51824753556", "2000", "NSW", "Harbour Mining"),   // all pass
      ("51824753557", "2000", "NSW", "Bad Checksum Co"),  // abn fails
      ("51824753556", "0123", "NSW", "Bad Postcode Co"),  // postcode fails
      ("51824753556", "2000", "XX", ""),                  // state + name fail
      (null, null, null, null))                           // everything fails
      .toDF("abn", "postcode", "state", "entity_name")
    val checked = Validate.check(df, Validate.companyRules)
    val valid = Validate.valid(checked)
    assert(valid.count() == 1)
    assert(valid.columns.toSeq == Seq("abn", "postcode", "state", "entity_name"))
    val quarantined = Validate.quarantine(checked)
      .select(col("entity_name"), col("__failed"))
      .collect()
      .map(r => Option(r.getString(0)).getOrElse("<null>") ->
        r.getAs[scala.collection.Seq[String]](1).toSet).toMap
    assert(quarantined("Bad Checksum Co") == Set("abn_checksum"))
    assert(quarantined("Bad Postcode Co") == Set("postcode_au"))
    assert(quarantined("") == Set("state_known", "name_present"))
    assert(quarantined("<null>") ==
      Set("abn_checksum", "postcode_au", "state_known", "name_present"))
  }

  test("custom rule sets compose with and()") {
    import spark.implicits._
    val df = Seq((5, "x"), (50, "y"), (500, "")).toDF("n", "s")
    val rs = Validate.rules("n_small" -> (col("n") < 100))
      .and("s_nonempty", length(col("s")) > 0)
    val checked = Validate.check(df, rs)
    assert(Validate.valid(checked).count() == 2)
    assert(Validate.quarantine(checked).count() == 1)
  }
}
