package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Messy-cell parsers for the classic ETL cleanup step (reference
  * fund_comp2.py:884-885 strips '%' before astype(float); :934
  * strips '$' and scales 'B' suffixes). Null on malformed input —
  * never a runtime error mid-pipeline — and all codegen'd
  * regexp/case expressions, so parsing stays inside the scan stage.
  */
object ParseFunctions {

  private val PctPat = "^\\s*(-?[0-9]+(\\.[0-9]+)?)%\\s*$"
  private val CurPat = "^\\s*\\$(-?[0-9]+(\\.[0-9]+)?)([KMB])?\\s*$"

  /** "12.5%" -> 12.5 (reference semantics: strip the sign, keep the
    * printed magnitude); anything else -> null.
    */
  def parsePercent(c: Column): Column =
    when(c.rlike(PctPat), regexp_extract(c, PctPat, 1).cast("double"))

  /** PII scrub for corpus curation: emails, international-ish phone
    * numbers, and long digit runs (account/card ids) replaced with
    * typed placeholder tokens. Chained codegen'd regexp_replace —
    * narrow, scan-stage work.
    */
  def redactPii(c: Column): Column = {
    val email = regexp_replace(c, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val phone = regexp_replace(email, "\\+?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{4}", "<PHONE>")
    regexp_replace(phone, "[0-9]{8,}", "<ID>")
  }

  /** "$1.25B" -> 1.25e9, "$45.10M" -> 4.51e7, "$123.45" -> 123.45;
    * malformed -> null.
    */
  def parseCurrency(c: Column): Column = {
    val base = regexp_extract(c, CurPat, 1).cast("double")
    val suf  = regexp_extract(c, CurPat, 3)
    when(c.rlike(CurPat),
      base * when(suf === "K", lit(1e3))
        .when(suf === "M", lit(1e6))
        .when(suf === "B", lit(1e9))
        .otherwise(lit(1.0)))
  }
}
