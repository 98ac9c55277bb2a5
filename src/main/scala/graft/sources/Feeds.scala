package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Instrument-metadata dimension schema (the ETF expense-ratio/
    * AUM/category enrichment surface): one row per symbol, so the
    * table is O(symbols) and always broadcastable regardless of
    * fact-side scale.
    */
  val InstrumentMetaSchema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("expense_ratio", DoubleType, nullable = true),
    StructField("aum_usd", DoubleType, nullable = true),
    StructField("category", StringType, nullable = true)
  ))

  /** Deterministic synthetic metadata dim on [[InstrumentMetaSchema]]
    * (md5-derived like every synthetic feed here; a vendor file lands
    * on the same schema through FileFeed-style mapping).
    */
  def syntheticInstrumentMeta(spark: SparkSession, symbols: Seq[String]): DataFrame = {
    val syms = spark.createDataset(symbols)(org.apache.spark.sql.Encoders.STRING).toDF("symbol")
    val seed = conv(substring(md5(col("symbol")), 1, 8), 16, 10).cast("double")
    syms
      .withColumn("expense_ratio", round((seed % 100) / 10000.0, 6))
      .withColumn("aum_usd", round((seed % 100000) * 1e6, 2))
      .withColumn("category",
        element_at(array(lit("equity"), lit("bond"), lit("commodity"), lit("mixed")),
          (seed % 4 + 1).cast("int")))
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
        case "orc"     => reader.orc(path)
        case "csv"     => reader.option("header", "true").schema(renamed(BarSchema, mapping)).csv(path)
        case "json"    => reader.schema(renamed(BarSchema, mapping)).json(path)
        case other     => throw new IllegalArgumentException(s"unsupported feed format: $other")
      }
      val std = mapping.foldLeft(raw) { case (df, (ours, theirs)) => df.withColumnRenamed(theirs, ours) }
      std
        .select(BarSchema.fieldNames.toSeq.map(col): _*)
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

  /** Bucketed + sorted table sink: co-locates join keys at WRITE
    * time so repeated joins/aggregations on `keyCol` skip the
    * shuffle entirely (the scan reports bucketed distribution to the
    * planner). The 100 TB pattern for fact tables joined every day
    * on the same key. Registers `table` in the session catalog with
    * data at `path`.
    */
  def writeBucketed(df: DataFrame, table: String, path: String, buckets: Int, keyCol: String): Unit =
    df.write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(buckets, keyCol).sortBy(keyCol).saveAsTable(table)

  /** JDBC sink (reference src/interface/db.py analog): Spark's JDBC
    * writer distributes inserts per partition; `batchsize` bounds
    * round trips. Use `numPartitions` upstream to cap concurrent
    * connections against the target DB.
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: String = "overwrite", batchSize: Int = 1000): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("batchsize", batchSize)
      .mode(mode).save()

  def readJdbc(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()

  // ---- document feeds (NewsAPI analog, reference app.py:409-426) ----

  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("published_ts", TimestampType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("body", StringType, nullable = false)
  ))

  trait DocumentFeed {
    def fetch(spark: SparkSession, sources: Seq[String], start: String, end: String): DataFrame
  }

  /** Deterministic synthetic document feed: articles are a pure
    * function of (source, doc_id) via md5 word picks — distributed
    * generation from spark.range, no driver loop, identical across
    * fetches. One article per source per 6h slot.
    */
  object SyntheticDocFeed extends DocumentFeed {
    private val Vocab = Seq("gain", "loss", "up", "down", "fast", "slow", "big", "small",
      "market", "stock", "fund", "rate", "growth", "risk", "good", "bad")

    def fetch(spark: SparkSession, sources: Seq[String], start: String, end: String): DataFrame = {
      // slot count computed driver-side from the literal range, so the
      // feed covers ANY span (no silent truncation at a range cap).
      // ONE parser for both the slot count and the timestamp base —
      // ISO dates only, rejected loudly otherwise
      val startDay = java.time.LocalDate.parse(start)
      val endDay   = java.time.LocalDate.parse(end)
      val nSlots   = (endDay.toEpochDay - startDay.toEpochDay) * 4
      require(nSlots >= 0, s"document feed range is inverted: $start > $end")
      val startMicros = startDay.toEpochDay * 86400L * 1000000L
      val srcs = spark
        .createDataset(sources.zipWithIndex.map { case (s, i) => (s, i.toLong) })(
          org.apache.spark.sql.Encoders.tuple(
            org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.scalaLong))
        .toDF("source", "src_idx")
      val vocab = array(Vocab.map(lit): _*)
      def word(seed: Column, j: Int): Column =
        element_at(vocab, (pmod(conv(substring(md5(concat(seed, lit(s":$j"))), 1, 8), 16, 10).cast("long"), lit(Vocab.size)) + 1).cast("int"))
      spark.range(0, nSlots)
        .withColumnRenamed("id", "slot")
        .crossJoin(broadcast(srcs))
        .withColumn("doc_id", col("slot") * sources.size + col("src_idx"))
        .withColumn("published_ts",
          timestamp_micros(lit(startMicros) + col("slot") * 21600000000L))
        .withColumn("seed", concat(col("source"), lit("#"), col("slot")))
        .withColumn("title", concat_ws(" ", word(col("seed"), 0), word(col("seed"), 1), word(col("seed"), 2)))
        .withColumn("body", concat_ws(" ", (0 until 12).map(j => word(col("seed"), 10 + j)): _*))
        .select("doc_id", "published_ts", "source", "title", "body")
    }
  }

  /** File-backed document feed with schema enforcement + column
    * mapping, mirroring FileFeed for the document world.
    */
  class FileDocFeed(path: String, format: String, mapping: Map[String, String] = Map.empty)
      extends DocumentFeed {
    def fetch(spark: SparkSession, sources: Seq[String], start: String, end: String): DataFrame = {
      val reader = spark.read
      val raw = format match {
        case "parquet" => reader.parquet(path)
        case "orc"     => reader.orc(path)
        case "csv"     => reader.option("header", "true").schema(renamed(DocSchema, mapping)).csv(path)
        case "json"    => reader.schema(renamed(DocSchema, mapping)).json(path)
        case other     => throw new IllegalArgumentException(s"unsupported feed format: $other")
      }
      val std = mapping.foldLeft(raw) { case (df, (ours, theirs)) => df.withColumnRenamed(theirs, ours) }
      std
        .select(DocSchema.fieldNames.toSeq.map(col): _*)
        .where(col("source").isin(sources: _*) &&
          col("published_ts") >= lit(start).cast("timestamp") &&
          col("published_ts") < lit(end).cast("timestamp"))
    }

    private def renamed(schema: StructType, mapping: Map[String, String]): StructType =
      StructType(schema.fields.map(f => f.copy(name = mapping.getOrElse(f.name, f.name))))
  }

  /** Adapter to the TextAnalysis/Dedup document shape: (doc_id,
    * text) with title prepended to body.
    */
  def docsAsCorpus(feed: DataFrame): DataFrame =
    feed.select(col("doc_id"), concat_ws(" ", col("title"), col("body")).as("text"))
}
