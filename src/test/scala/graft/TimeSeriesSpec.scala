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

  test("beta of benchmark vs itself would be 1; sanity on others") {
    import spark.implicits._
    val ab = TimeSeries.alphaBeta(Tables.events(spark, sf), 0L)
    assert(ab.count() > 0)
    assert(ab.filter($"r_squared" < 0 || $"r_squared" > 1).count() === 0)
  }
}
