package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset-split operators for training-
  * data pipelines. All randomness is md5-derived from a stable row
  * key, so every engine, every run, and every cluster size draws the
  * SAME sample — reproducibility is non-negotiable at 100 TB, and a
  * hash sample needs no global coordination (purely per-row, no
  * shuffle, prunes at the scan when combined with stored hash
  * columns).
  */
object Sampling {

  /** Uniform pseudo-random bucket in [0, 100) from a key column. */
  def hashPct(key: Column): Column =
    (conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 100).as("pct")

  /** Keep ~pct% of rows, deterministically. */
  def hashSample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10).cast("long") % 100 < pct)

  /** Reproducible train/validation/test split (90/5/5 by default). */
  def datasetSplit(df: DataFrame, keyCol: String, trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val pct = conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10).cast("long") % 100
    df.withColumn("split",
      when(pct < trainPct, "train")
        .when(pct < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Domain-mix resampling (the corpus-reweighting step that turns
    * raw web-scrape proportions into a target training mixture —
    * DoReMi/Pile-style source weighting): keep ~`rates(source)`% of
    * each source's documents (default `defaultPct` for unlisted
    * sources), drawn by the same md5 rule as [[hashSample]] so the
    * mixture is reproducible across engines, runs, and cluster
    * sizes. The rate table is a handful of literals compiled into
    * one CASE — purely per-row, zero shuffle, zero coordination.
    */
  def domainMix(df: DataFrame, rates: Map[String, Int], defaultPct: Int = 100,
                sourceCol: String = "source", keyCol: String = "doc_id"): DataFrame = {
    val rateCol = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (s, p)) => when(col(sourceCol) === s, lit(p)).otherwise(acc)
    }
    df.filter(
      conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10).cast("long") % 100 < rateCol)
  }

  /** Stratified sample: exactly `n` rows per stratum, chosen by the
    * deterministic hash order (rank window per stratum — one shuffle
    * on the stratum key).
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String, n: Int): DataFrame = {
    // 15 hex chars = 60 bits: 16 would overflow a signed long
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10).cast("long")
    val w = Window.partitionBy(stratumCol).orderBy(h.asc, col(keyCol).asc)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .drop("rn")
  }
}
