package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeries

class TimeSeriesSpec extends AnyFunSuite {
  import TestSession._

  test("compoundFromReturns agrees with telescoped cumulativeReturns") {
    import spark.implicits._
    val ev   = Tables.events(spark, sf)
    val tele = TimeSeries.cumulativeReturns(ev).select($"user_id", $"ts", $"cum_return")
    val gen  = TimeSeries
      .compoundFromReturns(TimeSeries.dailyReturns(ev))
      .select($"user_id", $"ts", $"growth")
    val joined = tele.join(gen, Seq("user_id", "ts"))
    // cum_return is rounded to 6 dp, so absolute agreement within
    // rounding granularity is the right bar, not relative error.
    val maxErr = joined
      .agg(max(abs($"cum_return" - $"growth")))
      .head().getDouble(0)
    assert(maxErr < 1e-5, s"absolute error $maxErr")
  }

  test("max drawdown is in [-1, 0]") {
    import spark.implicits._
    val dd = TimeSeries.maxDrawdown(Tables.events(spark, sf))
    assert(dd.filter($"max_drawdown" > 0 || $"max_drawdown" < -1).count() === 0)
  }

  test("ema tracks the series scale") {
    import spark.implicits._
    val e = TimeSeries.ema(Tables.events(spark, sf), 20)
    val bad = e.filter($"ema" < 0 || $"ema" > 500).count()
    assert(bad === 0)
  }

  test("EmaAggregate fold agrees with the closed-form window's last row") {
    import spark.implicits._
    val ev   = Tables.events(spark, sf)
    val fold = TimeSeries.emaFold(ev, 20)
    val closedLast = TimeSeries.ema(ev, 20)
      .withColumn("rmax", max($"rn").over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
      .filter($"rn" === $"rmax")
      .select($"user_id", $"ema")
    val joined = fold.join(closedLast, "user_id")
    val maxErr = joined.agg(max(abs($"ema_final" - $"ema"))).head().getDouble(0)
    assert(maxErr < 1e-4, s"fold vs closed form diverge: $maxErr")
  }

  test("closed-form EMA fails loudly past the overflow horizon; the fold does not") {
    import spark.implicits._
    // 10k points on one key: (1-a)^(-rn) for span 20 overflows past
    // rn ~ 7000 — the guard must raise instead of returning Inf/NaN
    val long = spark.range(10000).select(
      lit(1L).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + $"id" * 60000000L).as("ts"),
      (pmod($"id", lit(100)).cast("double") + 1.0).as("value"))
    val e = intercept[Exception] {
      TimeSeries.ema(long, 20).write.format("noop").mode("overwrite").save()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
    assert(chain(e).contains("emaFold"), s"guard did not fire: ${chain(e)}")
    // macd and rsi carry the same guard — on EVERY output column, so
    // pruning a subset (just the signal line) cannot drop the check
    val em = intercept[Exception] {
      TimeSeries.macd(long).select("user_id", "ts", "signal")
        .write.format("noop").mode("overwrite").save()
    }
    assert(chain(em).contains("emaFold"))
    // value magnitude alone can overflow the running sum INSIDE the
    // rn horizon (6950 rows < safeRn ~6994 for span 20, but values
    // ~1e10 overflow the weighted sum around rn ~6860) — the
    // non-finite check must still raise
    val big = spark.range(6950).select(
      lit(1L).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + $"id" * 60000000L).as("ts"),
      ((pmod($"id", lit(100)).cast("double") + 1.0) * 1e8).as("value"))
    val eb = intercept[Exception] {
      TimeSeries.ema(big, 20).write.format("noop").mode("overwrite").save()
    }
    assert(chain(eb).contains("emaFold"))
    // the fold path has no horizon: finite result on the same series
    val folded = TimeSeries.emaFold(long, 20).head()
    assert(!folded.isNullAt(1) && !folded.getDouble(1).isNaN && !folded.getDouble(1).isInfinite)
  }

  test("macd column's guard uses only the alphas it depends on") {
    import spark.implicits._
    // 4000 rows: past the signal EMA's horizon (~3138 for span 9) but
    // inside the fast EMA's (~4190 for span 12) — the macd column is
    // still exact and must NOT raise; signal (and hist) must raise
    val series = spark.range(4000).select(
      lit(1L).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + $"id" * 60000000L).as("ts"),
      (pmod($"id", lit(100)).cast("double") + 1.0).as("value"))
    TimeSeries.macd(series).select("user_id", "ts", "macd")
      .write.format("noop").mode("overwrite").save()
    val e = intercept[Exception] {
      TimeSeries.macd(series).select("user_id", "ts", "signal")
        .write.format("noop").mode("overwrite").save()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
    assert(chain(e).contains("emaFold"))
  }

  test("EmaAggregate buffer cap raises an actionable error on an oversized group") {
    import spark.implicits._
    val series = spark.range(200).select(
      lit(1L).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + $"id" * 60000000L).as("ts"),
      ($"id" % 7).cast("double").as("value"))
    spark.conf.set(graft.plans.EmaAggregate.MaxBufferRowsKey, "100")
    try {
      val e = intercept[Exception] {
        TimeSeries.emaFold(series, 20).write.format("noop").mode("overwrite").save()
      }
      def chain(t: Throwable): String =
        if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
      assert(chain(e).contains("graft_ema buffer exceeded"), s"wrong error: ${chain(e)}")
    } finally spark.conf.unset(graft.plans.EmaAggregate.MaxBufferRowsKey)
    // default cap: same series folds fine
    assert(TimeSeries.emaFold(series, 20).count() === 1)
  }

  test("beta of benchmark vs itself would be 1; sanity on others") {
    import spark.implicits._
    val ab = TimeSeries.alphaBeta(Tables.events(spark, sf), 0L)
    assert(ab.count() > 0)
    assert(ab.filter($"r_squared" < 0 || $"r_squared" > 1).count() === 0)
  }
}
