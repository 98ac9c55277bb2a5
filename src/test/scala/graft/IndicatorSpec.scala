package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeries

/** The EMA-family operators and their SQL oracles share one closed
  * form, so a formula error would pass the oracle gate. This spec is
  * the independent check: the textbook RECURSIVE definitions computed
  * locally on a small series must agree with the operators.
  */
class IndicatorSpec extends AnyFunSuite {
  import TestSession._

  private val xs = Vector(10.0, 11.0, 9.5, 12.0, 12.5, 11.8, 13.0, 12.2, 12.9, 14.0)

  private def df = {
    import spark.implicits._
    xs.zipWithIndex
      .map { case (x, i) => (1L, i.toLong, 1000L + i * 60L, x) }
      .toDF("user_id", "event_id", "t_us", "value")
      .withColumn("ts", timestamp_micros($"t_us" * 1000000L))
  }

  private def emaRec(vals: Seq[Double], a: Double): Seq[Double] =
    vals.tail.scanLeft(vals.head)((prev, x) => (1 - a) * prev + a * x)

  test("ema closed form equals the recursive definition") {
    import spark.implicits._
    val got = TimeSeries.ema(df, 20).orderBy($"ts").select($"ema").collect().map(_.getDouble(0))
    val want = emaRec(xs, 2.0 / 21)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-6, s"$g vs $w") }
  }

  test("macd closed forms equal the recursive definitions") {
    import spark.implicits._
    val rows = TimeSeries.macd(df).orderBy($"ts")
      .select($"macd", $"signal", $"hist").collect()
    val macdW   = emaRec(xs, 2.0 / 13).zip(emaRec(xs, 2.0 / 27)).map { case (f, s) => f - s }
    val signalW = emaRec(macdW, 2.0 / 10)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(r.getDouble(0) - macdW(i)) < 1e-6)
      assert(math.abs(r.getDouble(1) - signalW(i)) < 1e-6)
      assert(math.abs(r.getDouble(2) - (macdW(i) - signalW(i))) < 1e-6)
    }
  }

  test("rsi closed form equals the recursive definition") {
    import spark.implicits._
    val got = TimeSeries.rsi(df, 14).orderBy($"ts").select($"rsi").collect().map(_.getDouble(0))
    val deltas = xs.sliding(2).map(p => p(1) - p(0)).toVector
    val gains  = deltas.map(d => math.max(d, 0.0))
    val losses = deltas.map(d => math.max(-d, 0.0))
    val ag = emaRec(gains, 1.0 / 14)
    val al = emaRec(losses, 1.0 / 14)
    val want = ag.zip(al).map { case (g, l) => if (l != 0) 100.0 - 100.0 / (1 + g / l) else 100.0 }
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-6, s"$g vs $w") }
  }

  test("rolling stats equal direct window computations") {
    import spark.implicits._
    // benchmark = user 0, fund = user 1, same days
    val both = (0L to 1L).flatMap(u => xs.zipWithIndex.map { case (x, i) =>
      (u, u * 100 + i.toLong, i.toLong, if (u == 0) x else x * 1.5 + i)
    }).toDF("user_id", "event_id", "d", "value")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
    val got = TimeSeries.rollingStats(both, 0L, 3).orderBy($"day").collect()
    // direct: returns of each series on the daily grid
    def rets(vals: Seq[Double]) = vals.sliding(2).map(p => p(1) / p(0) - 1).toVector
    val fundR  = rets(xs.zipWithIndex.map { case (x, i) => x * 1.5 + i })
    val benchR = rets(xs)
    got.zipWithIndex.foreach { case (r, i) =>
      val lo = math.max(0, i - 2)
      val fw = fundR.slice(lo, i + 1)
      val bw = benchR.slice(lo, i + 1)
      val n  = fw.size
      if (n >= 2) {
        val mean = fw.sum / n
        val sd   = math.sqrt(fw.map(x => (x - mean) * (x - mean)).sum / (n - 1))
        val vol  = r.getAs[Double]("roll_vol")
        assert(math.abs(vol - sd * math.sqrt(252)) < 1e-5, s"row $i vol $vol vs ${sd * math.sqrt(252)}")
        val bm   = bw.sum / n
        val cov  = fw.zip(bw).map { case (x, y) => (x - mean) * (y - bm) }.sum / (n - 1)
        val bsd  = math.sqrt(bw.map(y => (y - bm) * (y - bm)).sum / (n - 1))
        if (sd > 0 && bsd > 0) {
          val corrW = cov / (sd * bsd)
          assert(math.abs(r.getAs[Double]("roll_corr") - corrW) < 1e-5, s"row $i corr")
        }
      }
    }
  }

  // one tick per day: each daily bar has high = low = close = y_i,
  // so the textbook definitions collapse to closed forms a local
  // fold can check exactly (incl. the flat-window null for %K and
  // the h-l=0 ATR degenerate)
  private val ys = Vector(10.0, 10.0, 10.0, 12.0, 11.0, 13.0, 9.0, 9.0, 9.0, 14.0)

  private def dailyDf = {
    import spark.implicits._
    ys.zipWithIndex
      .map { case (y, i) => (1L, i.toLong, i.toLong, y) }
      .toDF("user_id", "event_id", "d", "value")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
      .drop("d")
  }

  test("stochastic %K/%D match the rolling min/max definition, flat windows null") {
    import spark.implicits._
    val got = TimeSeries.stochastic(dailyDf, 3, 2).orderBy($"bar_start").collect()
    val kW: Vector[Option[Double]] = ys.indices.map { i =>
      val w  = ys.slice(math.max(0, i - 2), i + 1)
      val (mn, mx) = (w.min, w.max)
      if (mx == mn) None else Some((ys(i) - mn) / (mx - mn) * 100)
    }.toVector
    val dW: Vector[Option[Double]] = ys.indices.map { i =>
      val w = kW.slice(math.max(0, i - 1), i + 1).flatten
      if (w.isEmpty) None else Some(w.sum / w.size)
    }.toVector
    got.zipWithIndex.foreach { case (r, i) =>
      val gk = Option(r.getAs[java.lang.Double]("pct_k")).map(_.doubleValue)
      val gd = Option(r.getAs[java.lang.Double]("pct_d")).map(_.doubleValue)
      assert(gk.isDefined === kW(i).isDefined, s"row $i pct_k nullness")
      for (g <- gk; w <- kW(i)) assert(math.abs(g - w) < 1e-6, s"row $i pct_k $g vs $w")
      assert(gd.isDefined === dW(i).isDefined, s"row $i pct_d nullness")
      for (g <- gd; w <- dW(i)) assert(math.abs(g - w) < 1e-6, s"row $i pct_d $g vs $w")
    }
  }

  test("atr matches the true-range definition (single-tick bars: tr = |Δclose|, first 0)") {
    import spark.implicits._
    val got = TimeSeries.atr(dailyDf, 3).orderBy($"bar_start").collect()
    val trW = 0.0 +: ys.sliding(2).map(p => math.abs(p(1) - p(0))).toVector
    got.zipWithIndex.foreach { case (r, i) =>
      val w = trW.slice(math.max(0, i - 2), i + 1)
      assert(math.abs(r.getAs[Double]("tr") - trW(i)) < 1e-6, s"row $i tr")
      assert(math.abs(r.getAs[Double]("atr") - w.sum / w.size) < 1e-6, s"row $i atr")
    }
  }

  test("obv is the exact running sum of sign-weighted volume, all-integer") {
    import spark.implicits._
    val vols = Vector(5L, 3L, 7L, 2L, 9L, 4L, 6L, 1L, 8L, 10L)
    val df = ys.zip(vols).zipWithIndex
      .map { case ((y, k), i) => (1L, i.toLong, i.toLong, y, s"""{"k":$k}""") }
      .toDF("user_id", "event_id", "d", "value", "props")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
      .drop("d")
    val got = TimeSeries.obv(df).orderBy($"day").collect()
    val sv = 0L +: ys.sliding(2).zip(vols.tail.iterator).map { case (p, vol) =>
      math.signum(p(1) - p(0)).toLong * vol
    }.toVector
    val obvW = sv.scanLeft(0L)(_ + _).tail
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("volume") === vols(i), s"row $i volume")
      assert(r.getAs[Long]("obv") === obvW(i), s"row $i obv")
    }
  }

  test("donchian channel matches rolling max/min; breakouts fire against YESTERDAY's channel") {
    import spark.implicits._
    val got = TimeSeries.donchian(dailyDf, 3).orderBy($"bar_start").collect()
    val upW = ys.indices.map(i => ys.slice(math.max(0, i - 2), i + 1).max)
    val loW = ys.indices.map(i => ys.slice(math.max(0, i - 2), i + 1).min)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("upper") === upW(i), s"row $i upper")
      assert(r.getAs[Double]("lower") === loW(i), s"row $i lower")
      assert(math.abs(r.getAs[Double]("mid") - (upW(i) + loW(i)) / 2) < 1e-6, s"row $i mid")
      val bu = if (i == 0) false else ys(i) > upW(i - 1)
      val bd = if (i == 0) false else ys(i) < loW(i - 1)
      assert(r.getAs[Boolean]("breakout_up") === bu, s"row $i breakout_up")
      assert(r.getAs[Boolean]("breakout_down") === bd, s"row $i breakout_down")
    }
  }

  test("ewma vol matches the RiskMetrics recursion; constant series reads zero") {
    import spark.implicits._
    val rets  = Vector(0.01, -0.02, 0.015, -0.005, 0.03, -0.01, 0.02, 0.0)
    val cs    = rets.scanLeft(100.0)((c, r) => c * (1 + r))
    val flat  = Vector.fill(8)(50.0)
    val rows = cs.zipWithIndex.map { case (c, i) => (1L, i.toLong, i.toLong, c) } ++
      flat.zipWithIndex.map { case (c, i) => (2L, 100L + i, i.toLong, c) }
    val df = rows.toDF("user_id", "event_id", "d", "value")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
    val got = TimeSeries.ewmaVol(df).orderBy($"user_id", $"day").collect()
    // local recursion: v2_0 = r2_0; v2_t = 0.94 v2 + 0.06 r2
    val realized = cs.sliding(2).map(p => p(1) / p(0) - 1).toVector
    val v2 = realized.map(r => r * r).tail
      .scanLeft(realized.head * realized.head)((v, r2) => 0.94 * v + (1 - 0.94) * r2)
    val u1 = got.filter(_.getLong(0) == 1L)
    u1.zip(v2).foreach { case (r, w) =>
      assert(math.abs(r.getAs[Double]("ewma_vol_ann") - math.sqrt(w) * math.sqrt(252.0)) < 1e-5,
        s"row ${r.getString(1)}")
    }
    got.filter(_.getLong(0) == 2L).foreach(r =>
      assert(r.getAs[Double]("ewma_vol_ann") === 0.0, "flat series has zero vol"))
  }

  test("amihud and roll spread: hand-built bounce series implies the planted spread") {
    import spark.implicits._
    // closes bounce +-s/2 around 100: Delta p alternates +s, -s ->
    // autocov ~ -s^2 (in the fixed bounce pattern), roll = 2*sqrt(s^2)... with
    // mean(d)=0: cov = E[d*dl] = -s^2 exactly -> spread = 2s
    val s = 1.0
    val closes = (0 until 20).map(i => if (i % 2 == 0) 100.0 + s / 2 else 100.0 - s / 2)
    val df = closes.zipWithIndex.map { case (c, i) => (1L, i.toLong, i.toLong, c, 100L) }
      .toDF("user_id", "event_id", "d", "value", "k")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
      .withColumn("props", concat(lit("{\"k\":"), $"k", lit("}")))
    val roll = TimeSeries.rollSpread(df).head()
    assert(roll.getAs[Double]("autocov") < 0, "bid-ask bounce must be negatively autocorrelated")
    assert(math.abs(roll.getAs[Double]("roll_spread") - 2 * s) < 0.02,
      s"implied spread ~ 2s = ${2 * s}, got ${roll.getAs[Double]("roll_spread")}")
    val am = TimeSeries.amihudIlliquidity(df).head()
    // |ret| ~ s/100 per day, dollar volume ~ 100*100: illiq ~ 1e-6 * 1e9 = 1e3
    assert(am.getAs[Long]("n_days") === 19L)
    assert(am.getAs[Double]("amihud_1e9") > 100.0 && am.getAs[Double]("amihud_1e9") < 10000.0)
  }

  test("rolling beta: a 2x-levered clone reads ~2, the benchmark itself reads exactly 1") {
    import spark.implicits._
    val br = (0 until 30).map(i => 0.01 * math.sin(i * 0.9) + 0.002)
    def closes(uid: Long, mult: Double): Seq[(Long, Long, Long, Double)] = {
      val cs = br.scanLeft(100.0)((c, r) => c * (1 + mult * r))
      cs.zipWithIndex.map { case (c, i) => (uid, uid * 1000 + i, i.toLong, c) }
    }
    val df = (closes(0L, 1.0) ++ closes(1L, 2.0))
      .toDF("user_id", "event_id", "d", "value")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
    val got = TimeSeries.rollingBeta(df, 0L, 10).collect()
      .filter(r => r.getAs[Long]("n_obs") === 10L)
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getAs[Double]("beta"))).toMap
    got(0L).foreach(b => assert(b === 1.0, "benchmark against itself is exactly 1"))
    got(1L).foreach(b => assert(math.abs(b - 2.0) < 5e-3, s"2x clone must read ~2, got $b"))
  }

  test("half-life: an exact AR(1) with phi=0.5 reads beta=-0.5 and t-half exactly 1 day") {
    import spark.implicits._
    // c_t = 100 + 0.5 * (c_{t-1} - 100), c_0 = 200: pure mean reversion
    val closes1 = Iterator.iterate(200.0)(c => 100.0 + 0.5 * (c - 100.0)).take(12).toVector
    // a trending walk never reverts -> null half-life
    val closes2 = (0 until 12).map(i => 100.0 + 10.0 * i)
    val rows = closes1.zipWithIndex.map { case (c, i) => (1L, i.toLong, i.toLong, c) } ++
      closes2.zipWithIndex.map { case (c, i) => (2L, 100L + i, i.toLong, c) }
    val df = rows.toDF("user_id", "event_id", "d", "value")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
    val got = TimeSeries.halfLife(df).collect().map(r => r.getLong(0) -> r).toMap
    assert(math.abs(got(1L).getAs[Double]("beta") - (-0.5)) < 1e-6)
    assert(math.abs(got(1L).getAs[Double]("half_life_days") - 1.0) < 1e-6,
      "phi=0.5 halves the dislocation every day")
    assert(got(2L).isNullAt(got(2L).fieldIndex("half_life_days")),
      "a trending series must not report a half-life")
  }

  test("cross-sectional rank: per-day ranks dense, quintiles balanced, spread sign correct") {
    import spark.implicits._
    // 10 users, 2 days; day-1 returns are (uid+1) * 10% so ranks = uid order
    val rows = for (u <- 0L until 10L; d <- 0 to 1) yield {
      val close = if (d == 0) 100.0 else 100.0 * (1 + (u + 1) * 0.1)
      (u, u * 10 + d, d.toLong, close)
    }
    val df = rows.toDF("user_id", "event_id", "d", "value")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
    val got = TimeSeries.crossSectionalRank(df).orderBy($"rnk").collect()
    assert(got.length === 10, "one return row per user on day 1")
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rnk") === i + 1L)
      assert(r.getLong(1) === i.toLong, "rank order must follow return order")
      assert(r.getAs[Long]("quintile") === i / 2, s"user $i quintile")
    }
    val sp = TimeSeries.quintileSpread(df).head()
    // hi quintile returns 0.9, 1.0 -> mean 0.95; lo 0.1, 0.2 -> 0.15
    assert(math.abs(sp.getAs[Double]("hi_mean") - 0.95) < 1e-5)
    assert(math.abs(sp.getAs[Double]("lo_mean") - 0.15) < 1e-5)
    assert(math.abs(sp.getAs[Double]("spread") - 0.8) < 1e-5)
  }

  test("volume profile: volume conserves, poc is the heaviest bin, flat key collapses") {
    import spark.implicits._
    // closes 10..19 (ten days, one per bin), heavy volume on day 3
    val days = (0 until 10).map(i => (1L, i.toLong, i.toLong, 10.0 + i,
      if (i == 3) 1000L else 10L)) ++ (0 until 4).map(i => (2L, 100L + i, i.toLong, 5.0, 7L))
    val df = days.toDF("user_id", "event_id", "d", "value", "k")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
      .withColumn("props", concat(lit("{\"k\":"), $"k", lit("}")))
    val got = TimeSeries.volumeProfile(df, 10).collect()
    val u1 = got.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    assert(u1.map(_.getAs[Long]("volume")).sum === 1090L, "volume must conserve")
    val poc = u1.filter(_.getAs[Boolean]("poc"))
    assert(poc.length === 1 && poc.head.getAs[Long]("volume") === 1000L,
      "poc must be the heaviest level")
    val u2 = got.filter(_.getLong(0) == 2L)
    assert(u2.length === 1 && u2.head.getAs[Long]("bin") === 0L,
      "a flat key must collapse to one bin")
    assert(u2.head.getAs[Long]("volume") === 28L)
  }

  test("drawdown episodes: hand-built runs with exact depth, recovery, and boundaries") {
    import spark.implicits._
    // peak 100, dd to 90/95 (2d, recovered), new peak 110, dd 99 (1d, not recovered)
    val zs = Vector(100.0, 90.0, 95.0, 110.0, 99.0)
    val df = zs.zipWithIndex.map { case (z, i) => (1L, i.toLong, i.toLong, z) }
      .toDF("user_id", "event_id", "d", "value")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
    val got = TimeSeries.drawdownEpisodes(df).orderBy($"eid").collect()
    assert(got.length === 2)
    val e1 = got(0)
    assert(e1.getAs[Long]("n_days") === 2L)
    assert(math.abs(e1.getAs[Double]("max_depth") - (90.0 / 100.0 - 1)) < 1e-9)
    assert(e1.getAs[Boolean]("recovered"))
    val e2 = got(1)
    assert(e2.getAs[Long]("n_days") === 1L)
    assert(math.abs(e2.getAs[Double]("max_depth") - (99.0 / 110.0 - 1)) < 1e-6)
    assert(!e2.getAs[Boolean]("recovered"), "an episode running to series end is open")
  }

  test("lead-lag corr: a series that leads the benchmark peaks at shift +1, self at 0") {
    import spark.implicits._
    val n = 40
    val benchC = (0 to n).map(i => 100.0 + 10 * math.sin(i * 0.7) + i * 0.3)
    // user 1's day-t close = bench's day-(t+1) close -> r1(t) = rb(t+1)
    val rows =
      benchC.zipWithIndex.map { case (c, i) => (0L, i.toLong, i.toLong, c) } ++
        benchC.drop(1).zipWithIndex.map { case (c, i) => (1L, 1000L + i, i.toLong, c) }
    val df = rows.toDF("user_id", "event_id", "d", "value")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
    val got = TimeSeries.leadLagCorr(df, 0L, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(got((0L, 0L)) === 1.0, "benchmark against itself at shift 0 must be exactly 1")
    assert(got((1L, 1L)) === 1.0, "the leader's shift +1 correlation must be exactly 1")
    assert(got((1L, 0L)) < 0.999, "contemporaneous corr must not also read 1")
  }

  test("hurst: matches a local R/S fold; trending beats alternating") {
    import spark.implicits._
    // two deterministic 65-day series: a trending walk (runs persist)
    // and a strict alternator (every step reverts)
    def closes(uid: Long, rets: Seq[Double]): Seq[(Long, Long, Long, Double)] = {
      val cs = rets.scanLeft(100.0)((c, r) => c * (1 + r))
      cs.zipWithIndex.map { case (c, i) => (uid, uid * 1000 + i, i.toLong * 86400L + 3600L, c) }
    }
    val trendR = (0 until 64).map(i => 0.01 + 0.002 * math.sin(i / 5.0))
    val altR   = (0 until 64).map(i => if (i % 2 == 0) 0.05 else -0.0476190476)
    val df = (closes(1L, trendR) ++ closes(2L, altR))
      .toDF("user_id", "event_id", "t_s", "value")
      .withColumn("ts", timestamp_micros($"t_s" * 1000000L))
    val got = TimeSeries.hurst(df).collect().map(r => r.getLong(0) -> r).toMap
    // local reference fold of the same recipe
    def localH(rets: Seq[Double]): Double = {
      def y(n: Int): Double = {
        val lrs = rets.grouped(n).filter(_.size == n).flatMap { b =>
          val mean = b.sum / n
          val cum  = b.scanLeft(0.0)((a, r) => a + (r - mean)).tail
          val rng  = cum.max - cum.min
          val sd   = math.sqrt(b.map(r => math.pow(r - mean, 2)).sum / n)
          if (sd > 0) Some(BigDecimal(math.log(rng / sd)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
          else None
        }.toVector
        lrs.sum.toDouble / lrs.size
      }
      (y(16) - y(4)) / 1.3862943611198906
    }
    assert(math.abs(got(1L).getAs[Double]("hurst") - localH(trendR)) < 1e-6, "trending local match")
    assert(math.abs(got(2L).getAs[Double]("hurst") - localH(altR)) < 1e-6, "alternating local match")
    assert(got(1L).getAs[Double]("hurst") > 0.6, s"persistent series must read trending")
    assert(got(2L).getAs[Double]("hurst") < 0.3, s"alternator must read mean-reverting")
  }

  test("peaks: local extrema only, prominence gate applied, endpoints excluded") {
    import spark.implicits._
    // closes: 10, 15(peak prom 3), 12, 11(trough? next 20 -> prom 1), 20(endpoint)
    val zs = Vector(10.0, 15.0, 12.0, 11.0, 20.0, 5.0, 6.0)
    val df = zs.zipWithIndex
      .map { case (z, i) => (1L, i.toLong, i.toLong * 86400L + 3600L, z) }
      .toDF("user_id", "event_id", "t_s", "value")
      .withColumn("ts", timestamp_micros($"t_s" * 1000000L))
    // prominence >= 2: peak at i=1 (15 over max(10,12)=12 -> 3) and
    // trough at i=5 (5 under min(20,6)=6 -> 1, fails); trough at i=3
    // (11 under min(12,20)=12 -> 1, fails); peak at i=4 (20 over
    // max(11,5)=11 -> 9)
    val got = TimeSeries.peaks(df, 2.0).orderBy($"day").collect()
      .map(r => (r.getString(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === Seq(("peak", 15.0, 3.0), ("peak", 20.0, 9.0)), got.mkString(","))
    // prominence 0: the two weak troughs now qualify
    val all = TimeSeries.peaks(df, 0.0).collect().map(_.getString(2))
    assert(all.count(_ == "trough") === 2 && all.count(_ == "peak") === 2)
  }

  test("ichimoku: spans/cloud match the rolling-channel definitions with exact alignment") {
    import spark.implicits._
    val got = TimeSeries.ichimoku(dailyDf, 3, 4, 6).orderBy($"bar_start").collect()
    def chanMid(i: Int, n: Int): Double = {
      val w = ys.slice(math.max(0, i - (n - 1)), i + 1)
      (w.max + w.min) / 2
    }
    got.zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(r.getAs[Double]("tenkan") - chanMid(i, 3)) < 1e-9, s"row $i tenkan")
      assert(math.abs(r.getAs[Double]("kijun") - chanMid(i, 4)) < 1e-9, s"row $i kijun")
      if (i < 4) {
        assert(r.isNullAt(r.fieldIndex("senkou_a")), s"row $i senkou_a should be null")
        assert(r.isNullAt(r.fieldIndex("senkou_b")), s"row $i senkou_b should be null")
        assert(r.isNullAt(r.fieldIndex("above_cloud")), s"row $i above_cloud should be null")
      } else {
        val sa = (chanMid(i - 4, 3) + chanMid(i - 4, 4)) / 2
        val sb = chanMid(i - 4, 6)
        assert(math.abs(r.getAs[Double]("senkou_a") - sa) < 1e-6, s"row $i senkou_a")
        assert(math.abs(r.getAs[Double]("senkou_b") - sb) < 1e-6, s"row $i senkou_b")
        assert(r.getAs[Boolean]("above_cloud") === (ys(i) > math.max(sa, sb)), s"row $i cloud")
      }
      if (i + 4 < ys.size)
        assert(r.getAs[Double]("chikou") === ys(i + 4), s"row $i chikou")
      else assert(r.isNullAt(r.fieldIndex("chikou")), s"row $i chikou should be null")
    }
  }

  test("pivot points: levels derive from YESTERDAY's bar, first bar null, ordering holds") {
    import spark.implicits._
    val hi = Vector(11.0, 12.0, 10.0, 14.0, 12.0)
    val lo = Vector(10.0, 10.5, 9.0, 11.0, 11.5)
    val two = hi.indices.flatMap { i =>
      Seq((1L, i.toLong * 2, i.toLong * 86400L + 3600L, lo(i)),
        (1L, i.toLong * 2 + 1, i.toLong * 86400L + 7200L, hi(i)))
    }.toDF("user_id", "event_id", "t_s", "value")
      .withColumn("ts", timestamp_micros($"t_s" * 1000000L))
    val got = TimeSeries.pivotPoints(two).orderBy($"bar_start").collect()
    assert(got.head.isNullAt(got.head.fieldIndex("pivot")))
    got.zipWithIndex.drop(1).foreach { case (r, i) =>
      val (h, l, c) = (hi(i - 1), lo(i - 1), hi(i - 1)) // close = last tick = hi
      val p = (h + l + c) / 3
      assert(math.abs(r.getAs[Double]("pivot") - p) < 1e-6, s"row $i pivot")
      assert(math.abs(r.getAs[Double]("r1") - (2 * p - l)) < 1e-6, s"row $i r1")
      assert(math.abs(r.getAs[Double]("s1") - (2 * p - h)) < 1e-6, s"row $i s1")
      assert(math.abs(r.getAs[Double]("r2") - (p + (h - l))) < 1e-6, s"row $i r2")
      assert(math.abs(r.getAs[Double]("s2") - (p - (h - l))) < 1e-6, s"row $i s2")
      // level ordering: s2 <= s1 <= p <= r1 <= r2 (holds whenever l <= c=h)
      assert(r.getAs[Double]("s2") <= r.getAs[Double]("s1") + 1e-9)
      assert(r.getAs[Double]("s1") <= r.getAs[Double]("pivot") + 1e-9)
      assert(r.getAs[Double]("pivot") <= r.getAs[Double]("r1") + 1e-9)
      assert(r.getAs[Double]("r1") <= r.getAs[Double]("r2") + 1e-9)
      assert(r.getAs[Boolean]("above_pivot") === (hi(i) > p), s"row $i above_pivot")
    }
  }

  test("cmf matches the money-flow definition; flat bars contribute zero; bounded") {
    import spark.implicits._
    // two ticks per day so bars carry a real high/low range
    val hi  = Vector(11.0, 12.0, 10.0, 14.0, 12.0)
    val lo  = Vector(10.0, 10.5, 10.0, 11.0, 9.0) // day 2 flat (hi == lo? no: set flat via equal)
    val cl  = Vector(10.5, 11.0, 10.0, 13.0, 10.0)
    val vols = Vector(4L, 6L, 3L, 8L, 5L)
    val rows = (0 until 5).flatMap { d =>
      val base = d.toLong * 86400L + 3600L
      // low tick first, close tick last; high in between
      Seq((1L, d * 10L + 0L, base, lo(d), s"""{"k":${vols(d) - 2}}"""),
        (1L, d * 10L + 1L, base + 60L, hi(d), s"""{"k":1}"""),
        (1L, d * 10L + 2L, base + 120L, cl(d), s"""{"k":1}"""))
    }
    val df = rows.toDF("user_id", "event_id", "t_s", "value", "props")
      .withColumn("ts", timestamp_micros($"t_s" * 1000000L)).drop("t_s")
    val got = TimeSeries.cmf(df, 3).orderBy($"day").collect()
    val mfm = (0 until 5).map { d =>
      val (h, l, c) = (math.max(hi(d), math.max(lo(d), cl(d))), math.min(lo(d), math.min(hi(d), cl(d))), cl(d))
      if (h == l) 0.0 else ((c - l) - (h - c)) / (h - l)
    }
    val mfv = (0 until 5).map(d => mfm(d) * vols(d))
    got.zipWithIndex.foreach { case (r, i) =>
      val w  = math.max(0, i - 2) to i
      val num = w.map(mfv).sum
      val den = w.map(vols).sum.toDouble
      assert(math.abs(r.getAs[Double]("mfv") - mfv(i)) < 1e-6, s"row $i mfv")
      assert(math.abs(r.getAs[Double]("cmf") - num / den) < 1e-6, s"row $i cmf")
      assert(math.abs(r.getAs[Double]("cmf")) <= 1.0 + 1e-9, s"row $i cmf bound")
    }
  }

  test("parkinson vol: zero on flat series, matches the estimator on ranged bars") {
    import spark.implicits._
    // flat key 1 (every bar high == low), ranged key 2
    val flat = (0 until 4).map(d => (1L, d.toLong, d.toLong * 86400L + 3600L, 10.0))
    val ranged = (0 until 4).flatMap { d =>
      Seq((2L, 100L + d * 2L, d.toLong * 86400L + 3600L, 10.0 + d),
        (2L, 101L + d * 2L, d.toLong * 86400L + 7200L, 12.0 + d))
    }
    val df = (flat ++ ranged).toDF("user_id", "event_id", "t_s", "value")
      .withColumn("ts", timestamp_micros($"t_s" * 1000000L)).drop("t_s")
    val got = TimeSeries.parkinsonVol(df).orderBy($"user_id").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Double]("parkinson_vol") === 0.0)
    val x = (0 until 4).map(d => math.pow(math.log((12.0 + d) / (10.0 + d)), 2)).sum
    val want = math.sqrt(x / (4 * math.log(2) * 4))
    assert(math.abs(got(1).getAs[Double]("parkinson_vol") - want) < 1e-6)
    assert(got(1).getAs[Long]("n_bars") === 4L)
  }

  test("williams %R equals stochastic %K - 100, null on the same flat windows") {
    import spark.implicits._
    val k = TimeSeries.stochastic(dailyDf, 3, 1).orderBy($"bar_start").collect()
    val r = TimeSeries.williamsR(dailyDf, 3).orderBy($"bar_start").collect()
    assert(k.length === r.length)
    k.zip(r).zipWithIndex.foreach { case ((kr, rr), i) =>
      val gk = Option(kr.getAs[java.lang.Double]("pct_k")).map(_.doubleValue)
      val gr = Option(rr.getAs[java.lang.Double]("pct_r")).map(_.doubleValue)
      assert(gk.isDefined === gr.isDefined, s"row $i nullness")
      for (a <- gk; b <- gr) assert(math.abs(b - (a - 100.0)) < 1e-5, s"row $i: $b vs ${a - 100}")
    }
  }

  test("mfi matches the pos/neg money-flow ratio on single-tick bars") {
    import spark.implicits._
    val vols = Vector(5L, 3L, 7L, 2L, 9L, 4L, 6L, 1L, 8L, 10L)
    val df = ys.zip(vols).zipWithIndex
      .map { case ((y, k), i) => (1L, i.toLong, i.toLong, y, s"""{"k":$k}""") }
      .toDF("user_id", "event_id", "d", "value", "props")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
      .drop("d")
    val got = TimeSeries.mfi(df, 3).orderBy($"day").collect()
    // single-tick bars: tp = value; pos/neg split by Δtp, first bar neither
    val pos = ys.indices.map(i =>
      if (i > 0 && ys(i) > ys(i - 1)) ys(i) * vols(i) else 0.0)
    val neg = ys.indices.map(i =>
      if (i > 0 && ys(i) < ys(i - 1)) ys(i) * vols(i) else 0.0)
    got.zipWithIndex.foreach { case (row, i) =>
      val w = math.max(0, i - 2) to i
      val (p, n) = (w.map(pos).sum, w.map(neg).sum)
      val g = Option(row.getAs[java.lang.Double]("mfi")).map(_.doubleValue)
      if (p + n == 0.0) assert(g.isEmpty, s"row $i should be null")
      else assert(math.abs(g.get - 100.0 * p / (p + n)) < 1e-6, s"row $i mfi")
      assert(math.abs(row.getAs[Double]("tp") - ys(i)) < 1e-9, s"row $i tp")
    }
  }

  test("keltner: mid is the EMA of typical price, bands are mid ± mult·ATR") {
    import spark.implicits._
    val got = TimeSeries.keltner(dailyDf, 20, 3, 2.0).orderBy($"bar_start").collect()
    // single-tick bars: tp = close = value, tr = |Δ| (first bar 0)
    val midW = emaRec(ys, 2.0 / 21)
    val trW  = 0.0 +: ys.sliding(2).map(p => math.abs(p(1) - p(0))).toVector
    got.zipWithIndex.foreach { case (r, i) =>
      val atrW = { val w = trW.slice(math.max(0, i - 2), i + 1); w.sum / w.size }
      assert(math.abs(r.getAs[Double]("mid") - midW(i)) < 1e-6, s"row $i mid")
      assert(math.abs(r.getAs[Double]("upper") - (midW(i) + 2 * atrW)) < 1e-5, s"row $i upper")
      assert(math.abs(r.getAs[Double]("lower") - (midW(i) - 2 * atrW)) < 1e-5, s"row $i lower")
    }
  }

  test("acf: a linear-growth return series has acf 1 at every lag it defines") {
    import spark.implicits._
    // exponential price series -> constant returns -> zero variance
    // -> null acf (the guard); an alternating series -> acf -1 at
    // lag 1, +1 at lag 2 on the overlap
    val alt = Vector.tabulate(12)(i => if (i % 2 == 0) 100.0 else 110.0)
    val df = alt.zipWithIndex
      .map { case (v, i) => (7L, i.toLong, i.toLong, v) }
      .toDF("user_id", "event_id", "d", "value")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
      .drop("d")
    val got = TimeSeries.acf(df, 2).orderBy($"lag_k").collect()
      .map(r => (r.getLong(1), Option(r.getAs[java.lang.Double]("acf")).map(_.doubleValue)))
    // returns alternate between +10% and -1/11 exactly: perfect
    // negative correlation at lag 1, perfect positive at lag 2
    assert(got.length === 2)
    assert(got(0)._1 === 1L && math.abs(got(0)._2.get - -1.0) < 1e-6)
    assert(got(1)._1 === 2L && math.abs(got(1)._2.get - 1.0) < 1e-6)
  }

  test("wma/roc/dpo: hand-checked integer chains, warmup rows null") {
    val df = closesDf(Seq(1L -> Seq(1.0, 2.0, 3.0, 4.0, 5.0)))
    val w = TimeSeries.wma(df, 3).orderBy("ts").collect()
    assert(w.take(2).forall(_.isNullAt(w.head.fieldIndex("wma"))), "first n-1 rows warm up")
    // (3x_t + 2x_{t-1} + x_{t-2}) / 6 — exact integer numerators
    // (IEEE division is correctly rounded, so 14e6/6e6 == 14.0/6.0 bitwise)
    assert(w.drop(2).map(_.getAs[Double]("wma")).toSeq ===
      Seq(14.0 / 6.0, 20.0 / 6.0, 26.0 / 6.0))
    val r = TimeSeries.roc(closesDf(Seq(1L -> Seq(100.0, 110.0, 99.0))), 1).orderBy("ts").collect()
    assert(r.head.isNullAt(r.head.fieldIndex("roc")))
    assert(r.drop(1).map(_.getAs[Double]("roc")).toSeq === Seq(10.0, -10.0))
    val d = TimeSeries.dpo(df, 4).orderBy("ts").collect()
    // x_{t-3} - SMA4: ramp gives a constant -1.5 once warm
    assert(d.take(3).forall(_.isNullAt(d.head.fieldIndex("dpo"))))
    assert(d.drop(3).map(_.getAs[Double]("dpo")).toSeq === Seq(-1.5, -1.5))
  }

  test("hma: zero lag on a linear ramp, identity on a constant, odd n rejected") {
    // HMA of a linear ramp IS the ramp (the zero-lag selling point):
    // WMA2(2*WMA2 - WMA4) telescopes exactly in the integer domain
    val ramp = TimeSeries.hma(closesDf(Seq(1L -> Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))), 4)
      .orderBy("ts").collect()
    assert(ramp.take(4).forall(_.isNullAt(ramp.head.fieldIndex("hma"))))
    assert(ramp.drop(4).map(_.getAs[Double]("hma")).toSeq === Seq(5.0, 6.0))
    val const = TimeSeries.hma(closesDf(Seq(1L -> Seq.fill(7)(42.0))), 4).orderBy("ts").collect()
    assert(const.drop(4).forall(_.getAs[Double]("hma") === 42.0))
    intercept[IllegalArgumentException] { TimeSeries.hma(closesDf(Nil), 5) }
  }

  private def closesDf(series: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    series.flatMap { case (uid, cs) =>
      cs.zipWithIndex.map { case (c, i) => (uid, uid * 1000 + i, i.toLong, c) }
    }.toDF("user_id", "event_id", "d", "value")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
  }

  test("spearman: a monotone transform of the benchmark reads exactly +1, an inverted one -1") {
    // well-separated returns so micro-return quantization cannot tie
    val br = Seq(0.05, -0.03, 0.11, 0.02, -0.08, 0.07, -0.01, 0.04, -0.05, 0.09)
    val bench = br.scanLeft(100.0)((c, r) => c * (1 + r))
    val mono  = bench.map(c => c * c / 100.0)   // returns (1+r)^2-1: strictly increasing in r
    val inv   = bench.map(c => 10000.0 / c)     // returns 1/(1+r)-1: strictly decreasing in r
    val got = TimeSeries.spearmanCorr(closesDf(Seq(0L -> bench, 1L -> mono, 2L -> inv)), 0L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!got.contains(0L), "benchmark must be excluded from the output")
    assert(got(1L).getAs[Double]("spearman_rho") === 1.0,
      "rank correlation of a monotone transform is exactly 1")
    assert(got(2L).getAs[Double]("spearman_rho") === -1.0,
      "rank correlation of an inverted transform is exactly -1")
    assert(got(1L).getAs[Long]("n_days") === 10L)
  }

  test("kendall trend: strictly rising returns read tau=1, falling -1, constant all ties") {
    // returns themselves must be monotone across days (tau compares mk_t vs mk_t')
    val rising  = Seq(0.01, 0.02, 0.03, 0.04, 0.05)
    val falling = Seq(0.05, 0.04, 0.03, 0.02, 0.01)
    val flat    = Seq(0.02, 0.02, 0.02, 0.02, 0.02)
    def fromRets(rs: Seq[Double]) = rs.scanLeft(100.0)((c, r) => c * (1 + r))
    val got = TimeSeries.kendallTauTrend(closesDf(Seq(
        1L -> fromRets(rising), 2L -> fromRets(falling), 3L -> fromRets(flat))))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_pairs") === 10L)
    assert(got(1L).getAs[Double]("tau") === 1.0)
    assert(got(2L).getAs[Double]("tau") === -1.0)
    assert(got(3L).getAs[Long]("ties") === 10L && got(3L).getAs[Double]("tau") === 0.0)
  }

  test("cci: a linear ramp reads exactly +100 (the textbook constant-trend value)") {
    // one obs/day so tp = close; window 3: S and the deviation fold
    // are tiny exact integers, cci = +100 on every full window
    val got = TimeSeries.cci(closesDf(Seq(1L -> Seq(1.0, 2.0, 3.0, 4.0, 5.0))), 3)
      .orderBy("day").collect()
    assert(got.take(2).forall(_.isNullAt(2)), "partial windows must be null")
    got.drop(2).foreach(r => assert(r.getAs[Double]("cci") === 100.0))
  }

  test("cci: zero deviation (constant series) yields null, not a division blowup") {
    val got = TimeSeries.cci(closesDf(Seq(1L -> Seq.fill(5)(7.0))), 3).collect()
    assert(got.forall(_.isNullAt(2)))
  }

  test("aroon: rising ramp pins up=100/down at window age; flat series ties resolve LATEST") {
    val rising = TimeSeries.aroon(closesDf(Seq(1L -> Seq(1.0, 2.0, 3.0, 4.0, 5.0))), 3)
      .orderBy("day").collect()
    assert(rising.take(2).forall(_.isNullAt(2)), "partial windows must be null")
    rising.drop(2).foreach { r =>
      assert(r.getAs[Double]("aroon_up") === 100.0, "new high every day")
      assert(r.getAs[Double]("aroon_down") === 100.0 / 3, "low always at window start")
      assert(r.getAs[Double]("aroon_osc") === 100.0 - 100.0 / 3)
    }
    val flat = TimeSeries.aroon(closesDf(Seq(1L -> Seq.fill(5)(7.0))), 3)
      .orderBy("day").collect().drop(2)
    flat.foreach { r =>
      assert(r.getAs[Double]("aroon_up") === 100.0 && r.getAs[Double]("aroon_down") === 100.0,
        "ties must resolve to the LATEST extreme (today) on both sides")
      assert(r.getAs[Double]("aroon_osc") === 0.0)
    }
  }

  test("jarque-bera: symmetric +-50% returns read skew 0, excess kurtosis -2, JB = n/6 exactly") {
    // x1.5 / x0.75 alternation: both return ratios are exact binary
    // rationals, mk = +-500 milli-units exactly, all moments exact
    val closes = Iterator.iterate(100.0 :: Nil) { acc =>
      (if (acc.size % 2 == 1) acc.head * 1.5 else acc.head * 0.75) :: acc
    }.drop(8).next().reverse
    val outlier = Seq(1.0, 2500.0, 1.0) // +2499x jump excluded, then one kept return
    val got = TimeSeries.jarqueBera(closesDf(Seq(1L -> closes, 2L -> outlier)))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[Long]("n_days") === 8L && r1.getAs[Long]("n_excluded") === 0L)
    assert(r1.getAs[Double]("skewness") === 0.0)
    assert(r1.getAs[Double]("excess_kurtosis") === -2.0,
      "a two-point distribution has kurtosis exactly 1")
    assert(r1.getAs[Double]("jarque_bera") === 8.0 / 6)
    val r2 = got(2L)
    assert(r2.getAs[Long]("n_excluded") === 1L && r2.getAs[Long]("n_days") === 1L)
    assert(r2.isNullAt(r2.fieldIndex("jarque_bera")), "degenerate key must read null")
  }

  test("ljung-box: Q recomputes exactly from the acf pivot; alternating returns score huge") {
    // +50%/-33.3% alternation: rho_1 ~ -1, so Q must be large; a
    // second key with too few days must read null
    val alt = Iterator.iterate(Seq(100.0)) { acc =>
      acc :+ (if (acc.size % 2 == 1) acc.last * 1.5 else acc.last / 1.5)
    }.drop(29).next()
    val short = Seq(100.0, 101.0, 102.0, 103.0)
    val df = closesDf(Seq(1L -> alt, 2L -> short))
    val got = TimeSeries.ljungBox(df, 5).collect().map(r => r.getLong(0) -> r).toMap
    assert(got(2L).isNullAt(got(2L).fieldIndex("ljung_box_q")),
      "a series shorter than maxLag+2 must read null")
    // local recompute from the acf outputs (the defined semantics)
    val acfRows = TimeSeries.acf(df, 5).collect()
      .filter(_.getLong(0) == 1L)
      .map(r => r.getAs[Long]("lag_k") -> r.getAs[Double]("acf")).toMap
    val n = got(1L).getAs[Long]("n_obs").toDouble
    val want = (1 to 5).map(k => acfRows(k) * acfRows(k) / (n - k)).sum * n * (n + 2)
    val q = got(1L).getAs[Double]("ljung_box_q")
    assert(math.abs(q - want) < 1e-9, s"Q $q vs acf recompute $want")
    assert(q > 20.0, "near-perfect negative rho_1 must reject white noise loudly")
  }

  test("streaks: longest up/down runs and the signed current streak are exact") {
    // signs: + + - + + + 0 -  -> longest_up 3, longest_down 1, current -1
    val closes = Seq(100.0, 150.0, 225.0, 112.5, 168.75, 253.125, 379.6875,
      379.6875, 189.84375)
    val got = TimeSeries.streaks(closesDf(Seq(1L -> closes))).head()
    assert(got.getAs[Long]("longest_up") === 3L)
    assert(got.getAs[Long]("longest_down") === 1L)
    assert(got.getAs[Long]("current_streak") === -1L)
    // all-up series: current = longest = n returns
    val up = TimeSeries.streaks(closesDf(Seq(1L -> Seq(1.0, 2.0, 4.0, 8.0)))).head()
    assert(up.getAs[Long]("longest_up") === 3L && up.getAs[Long]("current_streak") === 3L)
    assert(up.getAs[Long]("longest_down") === 0L)
  }

  test("cvar: the tail mean sits below the VaR cut and matches the hand average") {
    val tail  = Seq(-0.10, -0.08, -0.06, -0.04, -0.02)
    val rest  = Seq.fill(15)(0.01)
    val rets  = tail ++ rest
    val closes = rets.scanLeft(100.0)((c, r) => c * (1 + r))
    val got = TimeSeries.cvar(closesDf(Seq(1L -> closes)), 0.25).head()
    assert(got.getAs[Long]("k") === 5L && got.getAs[Long]("n") === 20L)
    assert(math.abs(got.getAs[Double]("var_ret") - (-0.02)) < 1e-9)
    assert(math.abs(got.getAs[Double]("cvar") - (-0.06)) < 1e-5)
    assert(got.getAs[Double]("cvar") <= got.getAs[Double]("var_ret"))
  }

  test("pacf: lag-1 pacf equals acf(1) and the lag-2/3 recursions match the hand chain") {
    val rets = Seq(0.05, -0.03, 0.11, 0.02, -0.08, 0.07, -0.01, 0.04, -0.05, 0.09,
      0.03, -0.06, 0.08, -0.02, 0.01)
    val closes = rets.scanLeft(100.0)((c, r) => c * (1 + r))
    val row = TimeSeries.pacf(closesDf(Seq(1L -> closes))).head()
    val (r1, r2, r3) = (row.getAs[Double]("r1"), row.getAs[Double]("r2"), row.getAs[Double]("r3"))
    assert(row.getAs[Double]("pacf1") === r1)
    val v1 = 1.0 - r1 * r1
    val p2 = (r2 - r1 * r1) / v1
    assert(row.getAs[Double]("pacf2") === p2)
    val p21 = r1 - p2 * r1
    val v2  = v1 * (1.0 - p2 * p2)
    assert(row.getAs[Double]("pacf3") === (r3 - p21 * r2 - p2 * r1) / v2)
  }

  test("market timing: an exact quadratic exposure recovers alpha/beta/gamma") {
    // bench returns to 2dp; key returns r = 0.001 + 0.5 m + 2 m^2 land on exact micros
    val ms = Seq(0.02, -0.01, 0.03, -0.04, 0.01, 0.05, -0.03, 0.02, -0.02, 0.04)
    val rs = ms.map(m => 0.001 + 0.5 * m + 2.0 * m * m)
    val bench = ms.scanLeft(100.0)((c, r) => c * (1 + r))
    val fund  = rs.scanLeft(50.0)((c, r) => c * (1 + r))
    val got = TimeSeries.marketTiming(closesDf(Seq(0L -> bench, 1L -> fund)), 0L).head()
    // micro-quantization of the recovered returns leaves <= 1-unit noise per row
    assert(math.abs(got.getAs[Double]("alpha") - 0.001) < 1e-3)
    assert(math.abs(got.getAs[Double]("beta") - 0.5) < 5e-2)
    assert(math.abs(got.getAs[Double]("gamma") - 2.0) < 1.5)
    // too-short series reads null
    val short = TimeSeries.marketTiming(closesDf(Seq(0L -> bench.take(3), 1L -> fund.take(3))), 0L).head()
    assert(short.isNullAt(short.fieldIndex("gamma")))
  }

  test("adx: a monotone rise reads di_plus 100 / di_minus 0 / adx 100, flat bars read null") {
    // one print per day: up-move = +1 each bar, down-move = -1 -> +DM=1e6, -DM=0, TR=1e6
    val rising = (0 until 10).map(i => 100.0 + i)
    val rows = TimeSeries.adx(closesDf(Seq(1L -> rising)), 3).orderBy("day").collect()
    val last = rows.last
    assert(last.getAs[Double]("di_plus") === 100.0)
    assert(last.getAs[Double]("di_minus") === 0.0)
    assert(last.getAs[Double]("dx") === 100.0)
    assert(last.getAs[Double]("adx") === 100.0)
    // warmup rows carry nulls, never zeros: first DM row has cnt < n
    assert(rows.head.isNullAt(rows.head.fieldIndex("adx")))
    // a flat series has zero true range -> all outputs null (0/0 guarded)
    val flat = TimeSeries.adx(closesDf(Seq(1L -> Seq.fill(8)(50.0))), 3).collect()
    assert(flat.forall(r => r.isNullAt(r.fieldIndex("di_plus")) && r.isNullAt(r.fieldIndex("adx"))))
  }

  test("trix: constant series reads exactly 0; the 2-bar fold matches the hand recurrence") {
    val const = TimeSeries.trix(closesDf(Seq(1L -> Seq.fill(6)(42.0))), 15).orderBy("day").collect()
    assert(const.forall(_.getAs[Double]("triple_ema") === 42.0))
    assert(const.tail.forall(_.getAs[Double]("trix") === 0.0))
    assert(const.head.isNullAt(const.head.fieldIndex("trix")))
    // closes [1, 2]: e1 = [1, 1.125], e2 = [1, 1.015625], e3 = [1, 1.001953125]
    val two = TimeSeries.trix(closesDf(Seq(1L -> Seq(1.0, 2.0))), 15).orderBy("day").collect()
    assert(two(1).getAs[Double]("triple_ema") === 1.001953125)
    assert(two(1).getAs[Double]("trix") === 0.1953125)
  }

  test("tsi: constant steps read exactly +-100, a flat series guards to null") {
    // constant +1 momentum: every EMA stage is a fixed point at 1 -> TSI = 100 exactly
    val rising  = (0 until 8).map(i => 10.0 + i)
    val falling = (0 until 8).map(i => 50.0 - i)
    val flat    = Seq.fill(8)(30.0)
    val got = TimeSeries.tsi(closesDf(Seq(1L -> rising, 2L -> falling, 3L -> flat)))
      .collect().groupBy(_.getLong(0))
    assert(got(1L).forall(_.getAs[Double]("tsi") === 100.0))
    assert(got(2L).forall(_.getAs[Double]("tsi") === -100.0))
    assert(got(3L).forall(_.isNullAt(2)), "zero momentum: 0/0 guards to null")
    // two-step hand fold: moms [1, 3] -> e1 = [1, 1 + (2/26)*2], same for |.|, ratio 1
    val two = TimeSeries.tsi(closesDf(Seq(1L -> Seq(1.0, 2.0, 5.0)))).collect()
    assert(two.forall(_.getAs[Double]("tsi") === 100.0), "positive moms: num == den")
  }

  test("force index: raw FI is the exact integer price-move x volume; EMA matches the left fold") {
    import spark.implicits._
    val closes = Vector(10.0, 12.0, 11.0, 15.0)
    val vols   = Vector(2L, 3L, 4L, 5L)
    val df = closes.zip(vols).zipWithIndex.map { case ((c, k), i) =>
      (1L, i.toLong, i.toLong, c, s"""{"k":$k}""") }
      .toDF("user_id", "event_id", "d", "value", "props")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L)).drop("d")
    val got = TimeSeries.forceIndex(df).orderBy("day").collect()
    assert(got.length === 3, "first day has no previous close")
    // (12-10)*3, (11-12)*4, (15-11)*5 — exact at the 2dp price scale
    assert(got.map(_.getAs[Double]("force_raw")).toSeq === Seq(6.0, -4.0, 20.0))
    val a = 2.0 / 14
    val fiMicro = (1 until 4).map(i =>
      ((math.floor(closes(i) * 1e6).toLong - math.floor(closes(i - 1) * 1e6).toLong) * vols(i)).toDouble)
    val folds = fiMicro.tail.scanLeft(fiMicro.head)((y, x) => (1 - a) * y + a * x)
    assert(got.map(_.getAs[Double]("force_ema")).toSeq === folds.map(_ / 1000000))
  }

  test("elder ray: constant series reads exactly zero power; powers match the hand EMA fold") {
    val got0 = TimeSeries.elderRay(closesDf(Seq(1L -> Seq.fill(6)(25.0)))).collect()
    assert(got0.length === 6)
    assert(got0.forall(r =>
      r.getAs[Double]("bull_power") === 0.0 && r.getAs[Double]("bear_power") === 0.0),
      "EMA of a constant is a fixed point: both powers exactly 0")
    val cs  = Seq(2.0, 4.0, 8.0)
    val got = TimeSeries.elderRay(closesDf(Seq(1L -> cs))).orderBy("day").collect()
    val a   = 2.0 / 14
    val ema = cs.tail.scanLeft(cs.head)((y, x) => (1 - a) * y + a * x)
    got.zipWithIndex.foreach { case (r, i) =>
      // single-tick bars: high == low == close, so both powers are close - ema
      assert(r.getAs[Double]("bull_power") === cs(i) - ema(i), s"row $i bull")
      assert(r.getAs[Double]("bear_power") === cs(i) - ema(i), s"row $i bear")
    }
  }

  test("adl/chaikin: ADL is the cumsum fold of money-flow volume; first-bar oscillator is exactly 0") {
    import spark.implicits._
    val hi   = Vector(11.0, 12.0, 10.0, 14.0, 12.0)
    val lo   = Vector(10.0, 10.5, 10.0, 11.0, 9.0)
    val cl   = Vector(10.5, 11.0, 10.0, 13.0, 10.0)
    val vols = Vector(4L, 6L, 3L, 8L, 5L)
    val rows = (0 until 5).flatMap { d =>
      val base = d.toLong * 86400L + 3600L
      Seq((1L, d * 10L + 0L, base, lo(d), s"""{"k":${vols(d) - 2}}"""),
        (1L, d * 10L + 1L, base + 60L, hi(d), s"""{"k":1}"""),
        (1L, d * 10L + 2L, base + 120L, cl(d), s"""{"k":1}"""))
    }
    val df = rows.toDF("user_id", "event_id", "t_s", "value", "props")
      .withColumn("ts", timestamp_micros($"t_s" * 1000000L)).drop("t_s")
    val got = TimeSeries.adlChaikin(df).orderBy("day").collect()
    val mfv = (0 until 5).map { d =>
      val h = math.max(hi(d), math.max(lo(d), cl(d)))
      val l = math.min(lo(d), math.min(hi(d), cl(d)))
      val c = cl(d)
      if (h == l) 0.0 else ((c - l) - (h - c)) / (h - l) * vols(d).toDouble
    }
    val adl = mfv.tail.scanLeft(mfv.head)(_ + _)
    val aF  = 2.0 / 4
    val aS  = 2.0 / 11
    val ef  = adl.tail.scanLeft(adl.head)((y, x) => (1 - aF) * y + aF * x)
    val es  = adl.tail.scanLeft(adl.head)((y, x) => (1 - aS) * y + aS * x)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("adl") === adl(i), s"row $i adl")
      assert(r.getAs[Double]("chaikin_osc") === ef(i) - es(i), s"row $i chaikin")
    }
    assert(got.head.getAs[Double]("chaikin_osc") === 0.0, "both folds seed at adl[1]")
    assert(mfv(2) === 0.0, "the flat bar contributes zero money flow")
  }

  test("vol cones: a constant-return key reads exactly zero at every cut; both horizons emit") {
    // doubling closes: close/prev - 1 is EXACTLY 1.0 every day (power-
    // of-2 division is exact), so every window variance numerator is 0
    // (a 1.01-ratio series floats to mk 9999/10000 wobble)
    val closes = (0 until 31).map(i => 100.0 * math.pow(2.0, i))
    val got = TimeSeries.volCones(closesDf(Seq(1L -> closes))).orderBy("horizon").collect()
    assert(got.map(_.getAs[Int]("horizon")).toSeq === Seq(5, 21))
    got.foreach { r =>
      assert(r.getAs[Double]("vol_p10") === 0.0, s"horizon ${r.get(0)}")
      assert(r.getAs[Double]("vol_p50") === 0.0)
      assert(r.getAs[Double]("vol_p90") === 0.0)
    }
    assert(got(0).getAs[Long]("n_windows") === 26L, "30 returns - 4 warmup rows")
    assert(got(1).getAs[Long]("n_windows") === 10L)
    // an alternating key pushes the upper cuts strictly positive
    val mixed = (0 until 31).map(i => if (i % 2 == 0) 100.0 else 102.0)
    val g2 = TimeSeries.volCones(closesDf(Seq(1L -> closes, 2L -> mixed)))
      .orderBy("horizon").collect()
    g2.foreach(r => assert(r.getAs[Double]("vol_p90") > 0.0))
  }

  test("garch filter: flat series relaxes toward omega/(1-beta); fold matches the local recompute") {
    val flat = TimeSeries.garchFilter(closesDf(Seq(1L -> Seq.fill(20)(100.0)))).orderBy("day").collect()
    val sig2 = flat.map(_.getAs[Double]("sigma2"))
    assert(sig2.head === 0.0, "zero first return seeds sigma2 at 0")
    assert(sig2.zip(sig2.tail).forall { case (a, b) => b > a }, "omega pulls variance up")
    assert(sig2.last < 1e-6 / 0.1, "bounded by the stationary level omega/(1-beta)")
    // arbitrary series: the output IS the strict left fold of the recurrence
    val closes = Seq(100.0, 102.0, 99.0, 104.0, 101.0)
    val got = TimeSeries.garchFilter(closesDf(Seq(1L -> closes))).orderBy("day").collect()
    val rs = closes.sliding(2).map { case Seq(p0, c) => c / p0 - 1 }.toSeq
    // sigma2_t consumes the PREVIOUS return: fold over rs.init
    val want = rs.init.scanLeft(rs.head * rs.head)((y, x) => 1e-6 + 0.08 * x * x + 0.9 * y)
    assert(got.map(_.getAs[Double]("sigma2")).toSeq === want)
    assert(got.map(_.getAs[Double]("ret")).toSeq === rs)
  }

  test("kupiec pof: out-of-sample violations counted against the train-half VaR, LR matches hand") {
    import spark.implicits._
    // 20 returns: train half has one -10% day -> VaR threshold = -10%;
    // test half has two worse days -> x = 2 of n = 10
    val trainR = Seq(-0.10) ++ Seq.fill(9)(0.01)
    val testR  = Seq(-0.20, 0.01, 0.01, -0.25, 0.01, 0.01, 0.01, 0.01, 0.01, 0.01)
    val closes = (trainR ++ testR).scanLeft(100.0)((c, r) => c * (1 + r))
    val got = TimeSeries.kupiecPof(closesDf(Seq(1L -> closes))).head()
    assert(got.getAs[Long]("n_train") === 10L && got.getAs[Long]("n_test") === 10L)
    assert(got.getAs[Long]("n_viol") === 2L)
    // threshold is the train minimum's QUANTIZED return
    val mks = closes.sliding(2).map { case Seq(p0, c) => math.floor((c / p0 - 1) * 1e6).toLong }.toSeq
    assert(got.getAs[Double]("var_threshold") === mks.take(10).min.toDouble / 1e6)
    val lr = -2.0 * (8 * math.log(0.95) + 2 * math.log(0.05)
      - (8 * math.log(1.0 - 0.2) + 2 * math.log(0.2)))
    val want = BigDecimal(lr).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Double]("kupiec_lr") === want)
  }

  test("stoch rsi: a pinned-at-100 RSI window is flat (null %K); a fresh low reads exactly 0") {
    // 15 strict up-moves pin RSI at 100 (flat window -> null %K);
    // three down days then make the latest RSI the window minimum -> %K = 0
    val closes = (0 until 15).map(i => 100.0 * math.pow(1.01, i)) ++
      Seq(110.0, 105.0, 100.0)
    val got = TimeSeries.stochRsi(closesDf(Seq(1L -> closes))).orderBy("ts").collect()
    val ks = got.map(r => Option(r.getAs[java.lang.Double]("stoch_rsi")).map(_.doubleValue))
    assert(ks.take(14).forall(_.isEmpty), "a constant-100 RSI window has no defined %K")
    assert(ks.last.contains(0.0), "the latest RSI is the window min: %K exactly 0")
    ks.flatten.foreach(k => assert(k >= 0.0 && k <= 100.0, s"%K out of range: $k"))
  }

  test("mass index: constant-range bars read exactly sumN; partial windows are null") {
    import spark.implicits._
    // two ticks per day, 2 apart: rng = 2 -> e1 = e2 = 2 -> ratio = 1 -> 25-sum = 25
    val rows = (0 until 30).flatMap { d =>
      val base = d.toLong * 86400L + 3600L
      Seq((1L, d * 10L + 0L, base, 10.0), (1L, d * 10L + 1L, base + 60L, 12.0))
    }
    val df = rows.toDF("user_id", "event_id", "t_s", "value")
      .withColumn("ts", timestamp_micros($"t_s" * 1000000L)).drop("t_s")
    val got = TimeSeries.massIndex(df).orderBy("day").collect()
    assert(got.length === 30)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("ema_ratio") === 1.0, s"row $i ratio")
      if (i < 24) assert(r.isNullAt(r.fieldIndex("mass_index")), s"row $i partial window")
      else assert(r.getAs[Double]("mass_index") === 25.0, s"row $i mass")
    }
  }

  test("coppock: flat series reads exactly 0 after warm-up; a linear ramp matches the local recompute") {
    val flat = TimeSeries.coppock(closesDf(Seq(1L -> Seq.fill(30)(50.0)))).orderBy("day").collect()
    val full = flat.filter(!_.isNullAt(2))
    assert(full.length === 30 - 23, "ROC(14) + 9 more WMA lags gate the first defined row")
    assert(full.forall(_.getAs[Double]("coppock") === 0.0))
    val ramp = (0 until 30).map(i => 100.0 + i)
    val got  = TimeSeries.coppock(closesDf(Seq(1L -> ramp))).orderBy("day").collect()
    val qc   = ramp.map(c => math.floor(c * 1e6).toLong)
    def roc(i: Int, m: Int): Double = ((qc(i) - qc(i - m)) * 100).toDouble / qc(i - m).toDouble
    got.zipWithIndex.foreach { case (r, i) =>
      if (i >= 23) {
        val chain = (0 until 10)
          .map(j => (10 - j).toDouble * (roc(i - j, 14) + roc(i - j, 11)))
          .reduce(_ + _)
        assert(r.getAs[Double]("coppock") === chain / 55.0, s"row $i")
      } else assert(r.isNullAt(2), s"row $i must be null in warm-up")
    }
  }

  test("heikin ashi: the recursive open halves exactly and the bull flag follows the anchors") {
    // single print per day => ha_close = close; opens fold (2,4,8) -> (2, 2, 3)
    val got = TimeSeries.heikinAshi(closesDf(Seq(1L -> Seq(2.0, 4.0, 8.0)))).orderBy("day").collect()
    assert(got.map(_.getAs[Double]("ha_open")).toSeq === Seq(2.0, 2.0, 3.0))
    assert(got.map(_.getAs[Double]("ha_close")).toSeq === Seq(2.0, 4.0, 8.0))
    assert(got.map(_.getAs[Double]("ha_high")).toSeq === Seq(2.0, 4.0, 8.0))
    assert(got.map(_.getAs[Double]("ha_low")).toSeq === Seq(2.0, 2.0, 3.0))
    assert(got.map(_.getAs[Boolean]("ha_bull")).toSeq === Seq(false, true, true))
  }

  test("cmo: monotone rising reads exactly +100, falling -100, flat null") {
    val rising  = (0 until 20).map(i => 100.0 * math.pow(1.01, i))
    val falling = (0 until 20).map(i => 100.0 * math.pow(0.99, i))
    val flat    = Seq.fill(20)(100.0)
    val got = TimeSeries.chandeMomentum(
        closesDf(Seq(1L -> rising, 2L -> falling, 3L -> flat)), 14)
      .collect().groupBy(_.getLong(0))
    val full1 = got(1L).filter(!_.isNullAt(2))
    assert(full1.nonEmpty && full1.forall(_.getAs[Double]("cmo") === 100.0))
    val full2 = got(2L).filter(!_.isNullAt(2))
    assert(full2.nonEmpty && full2.forall(_.getAs[Double]("cmo") === -100.0))
    assert(got(3L).forall(_.isNullAt(2)), "zero movement must read null, not 0/0")
  }

  test("ultimate oscillator: constant-pressure up-grind reads exactly 100") {
    import spark.implicits._
    // bar [100+2i, 101+2i]: BP = TR = 2 every day, so every horizon
    // average is 1 and the blend is exactly 100
    val rows = (0 until 40).flatMap { i =>
      Seq((1L, i.toLong * 2, i.toLong * 86400 + 1000, 100.0 + 2 * i),
        (1L, i.toLong * 2 + 1, i.toLong * 86400 + 2000, 101.0 + 2 * i))
    }
    val df = rows.toDF("user_id", "event_id", "t_s", "value")
      .withColumn("ts", timestamp_micros($"t_s" * 1000000L))
    val got = TimeSeries.ultimateOscillator(df).orderBy("day").collect()
    val full = got.filter(!_.isNullAt(2))
    assert(full.nonEmpty, "40 bars must yield full 28-windows")
    full.foreach(r => assert(r.getAs[Double]("ultimate_osc") === 100.0))
  }

  test("vortex: a steady up-grind reads VI+ = 1.5 and VI- = 0.5 exactly") {
    import spark.implicits._
    // two obs per day: bar = [100+2i, 101+2i]; vm+ = 3, vm- = 1,
    // tr = 2 every day, so the window ratios are exact constants
    val rows = (0 until 20).flatMap { i =>
      Seq((1L, i.toLong * 2, i.toLong * 86400 + 1000, 100.0 + 2 * i),
        (1L, i.toLong * 2 + 1, i.toLong * 86400 + 2000, 101.0 + 2 * i))
    }
    val df = rows.toDF("user_id", "event_id", "t_s", "value")
      .withColumn("ts", timestamp_micros($"t_s" * 1000000L))
    val got = TimeSeries.vortex(df, 14).orderBy("day").collect()
    val full = got.filter(!_.isNullAt(2))
    assert(full.nonEmpty)
    full.foreach { r =>
      assert(r.getAs[Double]("vi_plus") === 1.5)
      assert(r.getAs[Double]("vi_minus") === 0.5)
      assert(r.getAs[Double]("vi_diff") === 1.0)
    }
  }

  test("cointegration: perfectly hedged pair reads beta 2 with null gamma; matches a local recompute") {
    // benchmark walk + (a) x = 2y exactly (residual identically 0
    // after the OLS fit -> see = 0 -> null gamma), (b) x = 2y plus
    // alternating +-8 noise (gamma -2 by the alternation algebra)
    // quarter-step closes are exact binary rationals, so the micro
    // quantization keeps x = 2y EXACT and the hedged residual is
    // identically zero (see = 0 -> null gamma)
    val y = Seq(400.0, 402.5, 398.75, 401.25, 399.5, 403.0, 400.75, 397.25,
      402.0, 398.5, 401.5, 399.25, 403.75, 400.25, 398.0, 401.0)
    val x1 = y.map(_ * 2)
    val x2 = y.zipWithIndex.map { case (c, i) => c * 2 + (if (i % 2 == 0) 8.0 else -8.0) }
    val got = TimeSeries.cointegration(
      closesDf(Seq(0L -> y, 1L -> x1, 2L -> x2)), 0L)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(math.abs(r1.getAs[Double]("beta") - 2.0) < 1e-6)
    assert(r1.isNullAt(r1.fieldIndex("gamma")), "a zero spread has no AR(1) dynamics")
    val r2 = got(2L)
    // the +-8 noise is large vs the tight y range, so the hedge
    // estimate wanders; the AR(1) alternation signature is the point
    assert(math.abs(r2.getAs[Double]("beta") - 2.0) < 0.5)
    assert(math.abs(r2.getAs[Double]("gamma") - (-2.0)) < 5e-2,
      s"alternating spread must read gamma ~ -2, got ${r2.getAs[Double]("gamma")}")
    assert(r2.isNullAt(r2.fieldIndex("spread_half_life")),
      "gamma outside (-1,0) has no half-life")
  }

  test("forecast backtest: exact 7-day seasonality reads MASE 0; a linear ramp reads exactly 7") {
    // periodic: value repeats every 7 days -> seasonal-naive error 0
    val periodic = (0 until 21).map(i => 100.0 + (i % 7) * 10.0)
    // ramp: +d/day -> naive error 7d, persistence error d -> MASE 7
    val ramp = (0 until 21).map(i => 100.0 + i * 3.0)
    val got = TimeSeries.forecastBacktest(closesDf(Seq(1L -> periodic, 2L -> ramp)), 7)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_scored") === 14L)
    assert(got(1L).getAs[Double]("mae_naive") === 0.0)
    assert(got(1L).getAs[Double]("mase") === 0.0)
    assert(got(2L).getAs[Double]("mase") === 7.0,
      "seasonal error is exactly 7x the persistence step on a linear ramp")
  }

  test("capture ratios: a 2x-levered clone reads ~2 up and ~2 down; spread is their difference") {
    val br = Seq(0.01, -0.02, 0.03, -0.01, 0.02, -0.03, 0.015, -0.025)
    val bench = br.scanLeft(100.0)((c, r) => c * (1 + r))
    val lev   = br.scanLeft(100.0)((c, r) => c * (1 + 2 * r))
    val got = TimeSeries.captureRatios(closesDf(Seq(0L -> bench, 1L -> lev)), 0L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!got.contains(0L), "benchmark must be excluded")
    val r1 = got(1L)
    assert(r1.getAs[Long]("n_up") === 4L && r1.getAs[Long]("n_dn") === 4L)
    val up = r1.getAs[Double]("up_capture"); val dn = r1.getAs[Double]("down_capture")
    assert(math.abs(up - 2.0) < 2e-3, s"2x clone up-capture ~2, got $up")
    assert(math.abs(dn - 2.0) < 2e-3, s"2x clone down-capture ~2, got $dn")
    assert(math.abs(r1.getAs[Double]("capture_spread") - (up - dn)) < 1e-12)
  }
}
