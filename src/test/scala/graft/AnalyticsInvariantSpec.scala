package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeries

/** Structural invariants of the round-5 analytics — properties that
  * must hold for ANY input, complementing the value-exact oracle
  * checks.
  */
class AnalyticsInvariantSpec extends AnyFunSuite {
  import TestSession._

  test("concentration: shares in (0,1], max weight <= top share, HHI bounded by max weight and 1") {
    import spark.implicits._
    val c = TimeSeries.concentration(Tables.events(spark, sf), 10, 10)
    assert(c.count() > 0)
    val bad = c.filter(
      $"top_share" <= 0 || $"top_share" > 1 + 1e-12 ||
        $"max_weight" <= 0 || $"max_weight" > $"top_share" + 1e-12 ||
        // HHI of positive weights lies in [max_w^2 .. max_w] and <= 1
        $"hhi" > $"max_weight" + 1e-12 || $"hhi" < $"max_weight" * $"max_weight" - 1e-12)
    assert(bad.count() === 0)
  }

  test("vwap lies within each bar's [low, high]") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val bars = graft.operators.Relational.ohlcResample(ev)
      .withColumn("day", col("bar_start"))
      .select($"user_id", $"day", $"low", $"high")
    val v = TimeSeries.vwap(ev).join(bars, Seq("user_id", "day"))
    assert(v.count() > 0)
    assert(v.filter($"vwap" < $"low" - 1e-9 || $"vwap" > $"high" + 1e-9).count() === 0)
  }

  test("momentum ranks are contiguous 1..n within every day") {
    import spark.implicits._
    val m = TimeSeries.momentumRank(Tables.events(spark, sf), 10)
    val perDay = m.groupBy($"day")
      .agg(count(lit(1)).as("n"), min($"mom_rank").as("lo"), max($"mom_rank").as("hi"),
        countDistinct($"mom_rank").as("d"))
    assert(perDay.count() > 0)
    assert(perDay.filter($"lo" =!= 1 || $"hi" =!= $"n" || $"d" =!= $"n").count() === 0)
  }

  test("benchmark check: flags agree with their metrics") {
    import spark.implicits._
    val b = TimeSeries.benchmarkValidation(Tables.events(spark, sf), 0L,
      minCorr = 0.3, minR2 = 0.1, maxTePct = 100000.0, betaLo = 0.0, betaHi = 2.0)
    assert(b.count() > 0)
    // rounded metrics differ from the unrounded test inputs by <=5e-7,
    // so only boundary-distant rows are asserted
    val eps = 1e-6
    val bad = b.filter(
      ($"corr_pass" === 1 && $"corr_test" < 0.3 - eps) ||
        ($"corr_pass" === 0 && $"corr_test" > 0.3 + eps) ||
        ($"te_pass" === 1 && $"tracking_error_pct" > 100000.0 + eps) ||
        ($"beta_pass" === 1 && ($"beta" < -eps || $"beta" > 2.0 + eps)) ||
        ($"all_pass" === 1 &&
          ($"corr_pass" === 0 || $"r2_pass" === 0 || $"te_pass" === 0 || $"beta_pass" === 0)))
    assert(bad.count() === 0)
  }

  test("information ratio sign matches mean active return") {
    import spark.implicits._
    // IR = avg(active)*252 / (std*sqrt(252)); std > 0, so the sign of
    // info_ratio must equal the sign of the mean active return
    val rets  = TimeSeries.dailyCloseReturns(Tables.events(spark, sf))
    val bench = rets.filter($"user_id" === 0L).select($"day", $"ret".as("bench_ret"))
    val means = rets.filter($"user_id" =!= 0L).join(bench, "day")
      .groupBy($"user_id").agg(avg($"ret" - $"bench_ret").as("m"))
    val ir = TimeSeries.informationRatio(Tables.events(spark, sf), 0L)
    val joined = ir.join(means, "user_id").filter($"info_ratio".isNotNull)
    assert(joined.count() > 0)
    assert(joined.filter(signum($"info_ratio") =!= signum($"m")).count() === 0)
  }
}
