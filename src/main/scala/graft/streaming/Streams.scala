package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch time-series operators:
  * the same logical windowed aggregation / sessionization expressed
  * over an unbounded source with watermarks, plus the batch
  * equivalents used for oracle checks.
  *
  * At scale the streaming state store shards by the group key, so
  * the same per-key partitioning argument as the batch path applies;
  * watermarks bound state size.
  */
object Streams {

  // ---- batch equivalents (oracle-checked) -----------------------------

  /** Tumbling-window counts/sums per event type (epoch-aligned, as
    * Spark's window() and DuckDB's time_bucket both are).
    */
  private val Money = org.apache.spark.sql.types.DecimalType(18, 2)

  def windowedAggBatch(events: DataFrame, width: String = "6 hours"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast(Money)).cast("double").as("total"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("total"))

  /** Gap-based sessionization: a new session starts after `gapMin`
    * minutes of inactivity; session ids are per-user running counts.
    */
  def sessionizeBatch(events: DataFrame, gapMin: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn(
        "new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMin * 60L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("start_us"),
        unix_micros(max(col("ts"))).as("end_us"),
        sum(col("value").cast(Money)).cast("double").as("total_value"))
  }

  // ---- streaming twins ------------------------------------------------

  /** Watermarked tumbling-window aggregation over a stream. */
  def windowedAggStream(events: DataFrame, width: String = "6 hours", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))

  /** ts_us: epoch micros — full event-time precision (Timestamp
    * round-trips through ms in the JVM and would truncate).
    */
  case class Ev(user_id: Long, ts_us: Long, value: Double)
  case class SessState(sessionId: Long, lastTsUs: Long, nEvents: Long, startUs: Long, total: Double)
  case class SessOut(user_id: Long, session_id: Long, n_events: Long, start_us: Long, end_us: Long, total_value: Double)

  /** Stateful sessionization with mapGroupsWithState: emits the
    * CURRENT session snapshot per user on every trigger (update
    * mode). State is one small record per user, bounded by timeout.
    */
  def sessionizeStream(events: Dataset[Ev], gapMin: Int = 30): Dataset[SessOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMin * 60L * 1000000L
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.value))
          var st = state.getOption.getOrElse(SessState(0L, Long.MinValue, 0L, 0L, 0.0))
          sorted.foreach { e =>
            val tsUs = e.ts_us
            st =
              if (st.nEvents == 0L || tsUs - st.lastTsUs > gapUs)
                SessState(st.sessionId + 1, tsUs, 1L, tsUs, e.value)
              else
                SessState(st.sessionId, tsUs, st.nEvents + 1, st.startUs, st.total + e.value)
          }
          state.update(st)
          SessOut(uid, st.sessionId, st.nEvents, st.startUs, st.lastTsUs, st.total)
      }
  }

  /** Streaming VWAP per key + event-time window: the real-time twin
    * of TimeSeries.vwap. The DECIMAL turnover and integral volume
    * sums are associative, so incremental micro-batch aggregation is
    * exactly the batch result once a window closes; watermark bounds
    * the state. Same one-shuffle shape as the batch bar.
    */
  def vwapStream(events: DataFrame, width: String = "1 day", watermark: String = "1 hour"): DataFrame = {
    val vol = get_json_object(col("props"), "$.k").cast("long")
    events
      .withWatermark("ts", watermark)
      .withColumn("vol", vol)
      .filter(col("vol").isNotNull && col("vol") > 0)
      .groupBy(window(col("ts"), width).as("w"), col("user_id"))
      .agg(
        sum(col("vol")).as("volume"),
        (sum(col("value").cast(Money) * col("vol").cast(org.apache.spark.sql.types.DecimalType(10, 0)))
          .cast("double") / sum(col("vol")).cast("double")).as("vwap"))
      .select(col("w.start").as("bar_start"), col("user_id"), col("volume"), col("vwap"))
  }

  /** Streaming exactly-once dedup on a business key: state bounded
    * by the watermark horizon (late duplicates beyond it age out of
    * the state store).
    */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-to-static enrichment: the static dim is broadcast to
    * every micro-batch; no stream-side state at all.
    */
  def enrichStream(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), "user_id")

  /** Stream-stream interval join: purchases matched to the same
    * user's clicks in the preceding hour. Both sides are watermarked
    * so the join state expires; the time-bound condition is what
    * lets Spark drop state — an unbounded stream-stream join would
    * accumulate forever.
    */
  def streamStreamJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("click_ts"), col("value").as("click_value"))
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    p.join(c,
      p("user_id") === c("user_id") &&
        c("click_ts") <= p("purchase_ts") &&
        c("click_ts") >= p("purchase_ts") - expr("interval 1 hour"))
      .select(p("user_id"), col("purchase_ts"), col("purchase_value"), col("click_ts"), col("click_value"))
  }

  /** Drive a streaming DataFrame to completion against a bounded
    * source and return the materialized result (memory sink).
    */
  /** Streaming document-feed analytics: per-source windowed count +
    * mean sentiment over an unbounded article stream (DocSchema
    * shape, graft.sources.Feeds) — the real-time news dashboard
    * path. Sentiment is a narrow per-row fold; only the windowed
    * per-source agg keeps state, bounded by the watermark.
    */
  def docSentimentStream(docs: DataFrame, width: String = "6 hours", watermark: String = "1 day"): DataFrame =
    docs
      .withColumn("text", concat_ws(" ", col("title"), col("body")))
      .withColumn("polarity",
        graft.functions.TextFunctions.sentimentPolarity(
          col("text"),
          graft.operators.TextAnalysis.PosLexicon,
          graft.operators.TextAnalysis.NegLexicon))
      .withWatermark("published_ts", watermark)
      .groupBy(window(col("published_ts"), width).as("w"), col("source"))
      .agg(count(lit(1)).as("n_docs"), round(avg(col("polarity")), 6).as("avg_polarity"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("source"), col("n_docs"), col("avg_polarity"))

  /** Batch equivalent of [[docSentimentStream]] for spec checks. */
  def docSentimentBatch(docs: DataFrame, width: String = "6 hours"): DataFrame =
    docs
      .withColumn("text", concat_ws(" ", col("title"), col("body")))
      .withColumn("polarity",
        graft.functions.TextFunctions.sentimentPolarity(
          col("text"),
          graft.operators.TextAnalysis.PosLexicon,
          graft.operators.TextAnalysis.NegLexicon))
      .groupBy(window(col("published_ts"), width).as("w"), col("source"))
      .agg(count(lit(1)).as("n_docs"), round(avg(col("polarity")), 6).as("avg_polarity"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("source"), col("n_docs"), col("avg_polarity"))

  def runToMemory(spark: SparkSession, stream: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = stream.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
