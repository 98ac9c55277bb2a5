package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pluggable market-data sources (the reference's yfinance/NewsAPI/
  * Finnhub connectors re-expressed for a zero-egress, cluster-native
  * world): every feed yields the same OHLCV bar schema so downstream
  * operators are source-agnostic.
  */
object Feeds {

  val BarSchema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("bar_date", DateType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", LongType, nullable = false)
  ))

  trait MarketDataFeed {
    def fetch(spark: SparkSession, symbols: Seq[String], start: String, end: String): DataFrame
  }

  /** Deterministic synthetic feed (yfinance-download analog): bars
    * are a pure function of (symbol, date) via md5, generated
    * distributed from spark.range — no driver loop, no network, and
    * two fetches of the same range are identical.
    */
  object SyntheticFeed extends MarketDataFeed {
    def fetch(spark: SparkSession, symbols: Seq[String], start: String, end: String): DataFrame = {
      val days = datediff(lit(end).cast("date"), lit(start).cast("date"))
      val syms = spark.createDataset(symbols)(org.apache.spark.sql.Encoders.STRING).toDF("symbol")
      spark.range(0, 100000)
        .withColumnRenamed("id", "d")
        .where(col("d") < days)
        .crossJoin(broadcast(syms))
        .withColumn("bar_date", date_add(lit(start).cast("date"), col("d").cast("int")))
        .withColumn("seed",
          conv(substring(md5(concat(col("symbol"), lit(":"), col("bar_date"))), 1, 8), 16, 10).cast("double"))
        .withColumn("base", lit(50.0) + (col("seed") % 1000) / 10.0)
        .withColumn("open", round(col("base"), 2))
        .withColumn("close", round(col("base") * (lit(1.0) + ((col("seed") % 97) - 48) / 1000.0), 2))
        .withColumn("high", round(greatest(col("open"), col("close")) * 1.01, 2))
        .withColumn("low", round(least(col("open"), col("close")) * 0.99, 2))
        .withColumn("volume", (col("seed") % 1000000).cast("long"))
        .select("symbol", "bar_date", "open", "high", "low", "close", "volume")
    }
  }

  /** File-backed feed with schema enforcement; format is parquet,
    * csv (with header) or json. Column mapping lets arbitrary
    * vendor files land on BarSchema.
    */
  class FileFeed(path: String, format: String, mapping: Map[String, String] = Map.empty)
      extends MarketDataFeed {
    def fetch(spark: SparkSession, symbols: Seq[String], start: String, end: String): DataFrame = {
      val reader = spark.read
      val raw = format match {
        case "parquet" => reader.parquet(path)
        case "csv"     => reader.option("header", "true").schema(renamed(BarSchema, mapping)).csv(path)
        case "json"    => reader.schema(renamed(BarSchema, mapping)).json(path)
        case other     => throw new IllegalArgumentException(s"unsupported feed format: $other")
      }
      val std = mapping.foldLeft(raw) { case (df, (ours, theirs)) => df.withColumnRenamed(theirs, ours) }
      std
        .select(BarSchema.fieldNames.map(col): _*)
        .where(col("symbol").isin(symbols: _*) &&
          col("bar_date") >= lit(start).cast("date") && col("bar_date") < lit(end).cast("date"))
    }

    private def renamed(schema: StructType, mapping: Map[String, String]): StructType =
      StructType(schema.fields.map(f => f.copy(name = mapping.getOrElse(f.name, f.name))))
  }

  /** Partitioned parquet sink: partition layout is the table's prune
    * key at read time (e.g. by symbol or by date for incremental
    * loads).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
