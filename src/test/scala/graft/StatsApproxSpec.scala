package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stats

class StatsApproxSpec extends AnyFunSuite {
  import TestSession._

  test("HLL distinct counts land within the configured error of exact") {
    import spark.implicits._
    val li    = Tables.lineitem(spark, sf)
    val exact = Stats.distinctCounts(li).select($"l_returnflag", $"n_orders".as("e_orders"))
    val appr  = Stats.approxDistinctCounts(li).select($"l_returnflag", $"n_orders".as("a_orders"))
    val bad = exact.join(appr, "l_returnflag")
      .filter(abs($"a_orders" - $"e_orders") > $"e_orders" * 0.1)
      .count()
    assert(bad === 0)
  }

  test("t-digest percentiles land near exact quantiles") {
    import spark.implicits._
    val ev    = Tables.events(spark, sf)
    val exact = Stats.percentiles(ev).select($"event_type", $"p50".as("e50"))
    val appr  = Stats.approxPercentiles(ev).select($"event_type", $"p50".as("a50"))
    val bad = exact.join(appr, "event_type")
      .filter(abs($"a50" - $"e50") > 2.0)
      .count()
    assert(bad === 0)
  }
}
