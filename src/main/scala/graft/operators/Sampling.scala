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
