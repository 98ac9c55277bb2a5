package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine-parity contract of the repo's 6dp round()
  * convention at its known hazard: half boundaries.
  *
  * Spark's Round over DoubleType is BigDecimal.valueOf(x) (the
  * SHORTEST decimal representation of the double) + setScale(6,
  * HALF_UP). DuckDB 1.0 instead rounds the SCALED double
  * (nearbyint(x·1e6)/1e6). The two agree except on a thin class of
  * inputs whose shortest representation ends exactly in ...5 at the
  * 7th decimal while x·1e6 falls on the other side of .5 (or vice
  * versa) — scripts/round_boundary_audit.py enumerates 29 such
  * inputs in a 3.9k sweep against the container's DuckDB. The gate
  * stays bit-exact because the repo's recipes either (a) keep chains
  * engine-identical BEFORE the shared round (same IEEE op order →
  * same double in → same rounding hazard resolved the same way is
  * NOT guaranteed — see the audit) or (b) avoid round() entirely on
  * exact-quotient outputs (the UNROUNDED house recipes).
  *
  * This spec pins the SPARK side of that contract: if a Spark
  * upgrade changes Round's double semantics (shortest-repr HALF_UP),
  * every still-rounded recipe silently shifts — this fails first,
  * locally. The audit script is the DuckDB-side twin.
  */
class RoundBoundarySpec extends AnyFunSuite {
  import TestSession._

  private def sparkConvention(x: Double): Double =
    JBigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue

  private def sweep: Seq[Double] = {
    val b = Seq.newBuilder[Double]
    // 6dp half boundaries (k+0.5)/1e6 and their ±1ulp neighbors
    var k = 0
    while (k < 2000) {
      val x = (k + 0.5) / 1e6
      b += x += Math.nextAfter(x, 0.0) += Math.nextAfter(x, 1.0)
      k += 7
    }
    // quotient-shaped inputs (the recipes' actual producers)
    for (m <- 1 until 400; n <- Seq(3, 7, 11, 13, 160000, 320000, 2000000))
      b += m.toDouble / n
    // halves of 6dp doubles — the (a+0)/2 class that fired on the
    // gate (q_stoch_rsi %D)
    var an = 1
    while (an < 2000) { b += (an / 1e6) / 2; an += 2 }
    b.result().distinct
  }

  test("Spark round(x, 6) is shortest-repr HALF_UP across the half-boundary sweep") {
    import spark.implicits._
    val xs = sweep
    val got = xs.toDF("x")
      .select(col("x"), round(col("x"), 6).as("r"))
      .collect()
      .map(r => r.getDouble(0) -> r.getDouble(1))
      .toMap
    val bad = xs.filter(x => got(x) != sparkConvention(x))
    assert(bad.isEmpty,
      s"Spark Round drifted from shortest-repr HALF_UP on ${bad.size} inputs, e.g. ${bad.take(5)}")
  }

  test("rounded window recipes (sma / bollinger mid) obey the same convention on boundary-landing quotients") {
    import spark.implicits._
    // craft series whose 2-row window averages land EXACTLY on the
    // (a+b)/2 half-boundary class: consecutive micro-quantized values
    // one odd micro-step apart
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (0 until 200).map { i =>
      val v = (1000001 + 2 * i + (i % 3)) / 1e6
      (1L, new java.sql.Timestamp(ts0.getTime + i * 60000L), v)
    }
    val df = rows.toDF("user_id", "ts", "value")
    val out = graft.operators.TimeSeries.sma(df, 2)
      .orderBy("ts").select(col("value"), col("sma")).collect()
    // reproduce the engine chain driver-side: sequential frame-order
    // average of the trailing 2 doubles, then the pinned convention
    val vals = rows.map(_._3).toArray
    out.zipWithIndex.foreach { case (r, i) =>
      val lo = math.max(0, i - 1)
      val mean = vals.slice(lo, i + 1).sum / (i + 1 - lo)
      assert(r.getDouble(1) == sparkConvention(mean),
        s"row $i: sma=${r.getDouble(1)} expected ${sparkConvention(mean)} from mean=$mean")
    }
  }
}
