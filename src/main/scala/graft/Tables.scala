package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables. Column pruning
  * and predicate pushdown happen at the scan as long as callers keep
  * the plan declarative (select/filter on these frames).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects by default. Read nanos as long and
    * truncate to micros (floor, matching DuckDB's ns->us behavior)
    * so downstream ops see a regular TimestampType column.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** Range-pruned events scan: the time predicate is applied to the
    * RAW nano long before the timestamp conversion, so it reaches the
    * parquet scan as PushedFilters (the conversion expression would
    * otherwise block pushdown — the difference between a pruned read
    * and a full 100 TB scan).
    */
  def eventsRange(spark: SparkSession, dir: String, startIncl: String, endExcl: String): DataFrame = {
    import org.apache.spark.sql.functions._
    def nanos(d: String): Long =
      java.time.LocalDate.parse(d).atStartOfDay(java.time.ZoneOffset.UTC).toInstant.getEpochSecond * 1000000000L
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .filter(col("ts") >= nanos(startIncl) && col("ts") < nanos(endExcl))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
