package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeries

class TimeSeriesSpec extends AnyFunSuite {
  import TestSession._

  test("ema/cumsum array kernels: bit-identical to the seeded HOF folds, null poisoning included") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val series: Seq[Seq[java.lang.Double]] = Seq(
      Seq(42.0),
      Seq(1.0, 2.0, 3.0, 4.0, 5.0),
      (0 until 500).map(_ => java.lang.Double.valueOf(rnd.nextDouble() * 1e6 - 5e5)),
      Seq[java.lang.Double](null, 1.0, 2.0),       // null head poisons everything
      Seq[java.lang.Double](1.0, null, 2.0, 3.0),  // mid null poisons the tail
      Seq(1e300, 1e300, -1e300, 0.5))
    val df = series.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "xs")
    for (a <- Seq(2.0 / 16, 0.5, 2.0 / 26)) {
      val rows = df.select(col("id"),
          TimeSeries.emaRecurrenceSeries(col("xs"), a).as("k"),
          TimeSeries.emaRecurrenceSeriesHof(col("xs"), a).as("h"))
        .collect()
      rows.foreach { r =>
        val k = r.getSeq[java.lang.Double](1); val h = r.getSeq[java.lang.Double](2)
        assert(k.length === h.length, s"a=$a id=${r.getLong(0)}: lengths differ")
        k.zip(h).zipWithIndex.foreach { case ((x, y), j) =>
          assert((x == null) === (y == null), s"a=$a id=${r.getLong(0)} [$j]: null-ness differs")
          if (x != null)
            assert(java.lang.Double.doubleToRawLongBits(x) === java.lang.Double.doubleToRawLongBits(y),
              s"a=$a id=${r.getLong(0)} [$j]: $x != $y")
        }
      }
    }
    val cs = df.select(col("id"),
        TimeSeries.cumSumSeries(col("xs")).as("k"),
        TimeSeries.cumSumSeriesHof(col("xs")).as("h"))
      .collect()
    cs.foreach { r =>
      val k = r.getSeq[java.lang.Double](1); val h = r.getSeq[java.lang.Double](2)
      assert(k.length === h.length)
      k.zip(h).foreach { case (x, y) =>
        assert((x == null) === (y == null), s"cumsum id=${r.getLong(0)}: null-ness differs")
        if (x != null)
          assert(java.lang.Double.doubleToRawLongBits(x) === java.lang.Double.doubleToRawLongBits(y))
      }
    }
  }

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

  test("ema auto-routes past the overflow horizon to the bit-exact fold; magnitude overflow still fails loudly") {
    import spark.implicits._
    // 100k points on one key: (1-a)^(-rn) for span 20 overflows past
    // rn ~ 7000 — the operator must route this key to the
    // graft_ema_series fold with NO caller change, not raise
    val n = 100000
    val long = spark.range(n.toLong).select(
      lit(1L).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + $"id" * 60000000L).as("ts"),
      (pmod($"id", lit(100)).cast("double") + 1.0).as("value"))
    val routed = TimeSeries.ema(long, 20)
    val got = routed.orderBy($"rn").select($"ema").collect().map(_.getDouble(0))
    assert(got.length === n)
    // bit-exact vs a JVM reference of the same recursive fold,
    // rounded 6 dp the way the operator rounds
    val a   = 2.0 / 21
    var y   = 0.0
    var bad = 0
    for (i <- 0 until n) {
      val x = (i % 100).toDouble + 1.0
      y = if (i == 0) x else a * x + (1 - a) * y
      val want = BigDecimal(y).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (got(i) != want) bad += 1
    }
    assert(bad === 0, s"$bad of $n routed EMA rows differ from the reference fold")
    // a SHORT key in the same frame keeps the closed-form path and
    // its values (mixed routing in one plan)
    val mixed = long.unionByName(spark.range(50).select(
      lit(2L).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + $"id" * 60000000L).as("ts"),
      ($"id".cast("double") + 1.0).as("value")))
    val shortRows = TimeSeries.ema(mixed, 20).filter($"user_id" === 2L)
    val shortRef  = TimeSeries.ema(spark.range(50).select(
      lit(2L).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + $"id" * 60000000L).as("ts"),
      ($"id".cast("double") + 1.0).as("value")), 20)
    assert(shortRows.orderBy($"rn").select($"ema").collect().toSeq ===
      shortRef.orderBy($"rn").select($"ema").collect().toSeq)
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
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

  test("correlationMatrix refuses a >20k-key universe BY DEFAULT, names the opt-outs") {
    import spark.implicits._
    // a 100x caller must not reach the O(keys^2) cliff without an
    // explicit opt-in: the default cap (no conf set) fires on its own
    // action, before the pair sweep runs. 20,001 keys x 2 days is a
    // 40k-row frame — the refusal must land in milliseconds-of-work,
    // not after 2*10^8 pairs.
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val wide = spark.range(0, (operators.TimeSeries.CorrMatrixDefaultMaxKeys + 1) * 2)
      .select(
        (col("id") / 2).cast("long").as("user_id"),
        when(col("id") % 2 === 0, lit(java.sql.Timestamp.from(base)))
          .otherwise(lit(java.sql.Timestamp.from(base.plusSeconds(86400)))).as("ts"),
        (col("id") % 7 + 1).cast("double").as("value"))
    val t = intercept[Throwable] {
      operators.TimeSeries.correlationMatrix(wide).collect()
    }
    val msg = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msg.contains("correlationMatrix") && msg.contains("O(keys^2)"), msg)
    assert(msg.contains("default cap") && msg.contains("exact=true"), msg)
    // exact=true bypasses the default (small frame: trivially runs)
    val small = Tables.events(spark, sf)
    assert(operators.TimeSeries.correlationMatrix(small, exact = true).limit(1).count() >= 0)
    // an explicit session conf WINS over the default in both directions
    try {
      spark.conf.set(operators.Guards.PairSweepMaxKeys, "3")
      val t2 = intercept[Throwable] {
        operators.TimeSeries.correlationMatrix(small).collect()
      }
      val msg2 = Iterator.iterate(t2)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
      assert(msg2.contains(operators.Guards.PairSweepMaxKeys), msg2)
    } finally spark.conf.unset(operators.Guards.PairSweepMaxKeys)
  }

  test("corrPairsBanded is a subset of the exact matrix with identical values, and finds planted pairs") {
    import spark.implicits._
    // subset-of-exact on the real fixture: every banded pair appears
    // in the full matrix with the same 6-dp corr and |corr| >= t
    val ev     = Tables.events(spark, sf)
    val banded = TimeSeries.corrPairsBanded(ev, minAbsCorr = 0.3)
      .select($"ka", $"kb", $"corr_ret".as("corr_banded"))
    val exact = TimeSeries.correlationMatrix(ev)
      .select($"ka", $"kb", $"corr_ret".as("corr_exact"))
    val joined = banded.join(exact, Seq("ka", "kb"), "left")
    assert(joined.filter($"corr_exact".isNull).count() === 0,
      "banded emitted a pair absent from the exact matrix")
    assert(joined.filter(abs($"corr_banded" - $"corr_exact") > 1e-9).count() === 0,
      "banded corr value differs from the exact matrix")
    assert(banded.filter(abs($"corr_banded") < 0.3).count() === 0)
    // recall on a planted perfectly-correlated pair: key 2's closes
    // are an affine transform of key 1's (corr = 1, identical sign
    // pattern in every band => guaranteed candidate); key 3 is
    // sign-alternating (anti-correlated with nothing planted)
    val days = 24
    val base = spark.range(days.toLong).select(
      $"id",
      timestamp_micros(lit(1704067200000000L) + $"id" * 86400000000L).as("ts"),
      (lit(100.0) + ($"id" % 5).cast("double") * 3.0 + $"id".cast("double")).as("v1"))
    val planted =
      base.select(lit(1L).as("user_id"), $"ts", $"v1".as("value"))
        .union(base.select(lit(2L).as("user_id"), $"ts", ($"v1" * 2.0 + 10.0).as("value")))
        .union(base.select(lit(3L).as("user_id"), $"ts",
          (lit(100.0) + when($"id" % 2 === 0, 5.0).otherwise(-5.0)).as("value")))
    val found = TimeSeries.corrPairsBanded(planted, minAbsCorr = 0.9)
      .filter($"ka" === 1L && $"kb" === 2L)
    assert(found.count() === 1, "planted corr=1 pair not recalled")
  }

  test("corrPairsBanded auto-widens past band-space saturation: still subset-of-exact, corr=1 recall kept") {
    import spark.implicits._
    // 700 keys x 21 days >> 8 * 2^6: the default 6-slot band space
    // saturates, so the widened regime (wEff > 6, tail band merged)
    // must engage — and stay a subset of the exact matrix with
    // identical values. Deterministic pseudo-random walks; keys 698
    // and 699 are affine twins (corr = 1, guaranteed collision in
    // every band regardless of width).
    val nK   = 700
    val days = 21
    val base = spark.range(nK.toLong * days)
      .select(($"id" / days).cast("long").as("user_id"), ($"id" % days).as("d"))
      .select($"user_id", $"d",
        timestamp_micros(lit(1704067200000000L) + $"d" * 86400000000L).as("ts"),
        (lit(100.0) + (pmod($"user_id" * 131 + $"d" * 37, lit(17)) - 8).cast("double") +
          (pmod($"user_id" * 17 + $"d" * $"d" * 7, lit(11)) - 5).cast("double") * 0.5).as("value"))
      .drop("d")
    val twin = base.filter($"user_id" === 698L)
      .select(lit(699L).as("user_id"), $"ts", ($"value" * 3.0 + 7.0).as("value"))
    val df = base.filter($"user_id" =!= 699L).unionByName(twin)
    val banded = TimeSeries.corrPairsBanded(df, minAbsCorr = 0.98)
      .select($"ka", $"kb", $"corr_ret".as("corr_banded"))
    assert(banded.filter($"ka" === 698L && $"kb" === 699L).count() === 1,
      "corr=1 twin pair lost by the widened banding")
    val exact = TimeSeries.correlationMatrix(df)
      .select($"ka", $"kb", $"corr_ret".as("corr_exact"))
    val joined = banded.join(exact, Seq("ka", "kb"), "left")
    assert(joined.filter($"corr_exact".isNull).count() === 0,
      "widened banding emitted a pair absent from the exact matrix")
    assert(joined.filter(abs($"corr_banded" - $"corr_exact") > 1e-9).count() === 0,
      "widened banding corr value differs from the exact matrix")
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

  test("peerPerformance: benchmark excluded, ranks a permutation, median inside the peer range") {
    import spark.implicits._
    val periods = Seq(("mtd", "2024-01-01", "2024-02-01"), ("p1w", "2024-01-24", "2024-02-01"))
    val pp = TimeSeries.peerPerformance(Tables.events(spark, sf), periods, 0L)
    assert(pp.count() > 0)
    assert(pp.filter($"user_id" === 0L).count() === 0)
    val badRank = pp.groupBy("period")
      .agg(count(lit(1)).as("n"), min("peer_rank").as("mn"),
        max("peer_rank").as("mx"), countDistinct("peer_rank").as("d"))
      .filter($"mn" =!= 1L || $"mx" =!= $"n" || $"d" =!= $"n")
    assert(badRank.count() === 0, "peer_rank is not a 1..n permutation per period")
    val badMed = pp.groupBy("period")
      .agg(min("period_return").as("lo"), max("period_return").as("hi"),
        first("peer_median").as("med"))
      .filter($"med" < $"lo" || $"med" > $"hi")
    assert(badMed.count() === 0, "peer_median outside the peer return range")
    // rank 1 carries the period's best return
    val top = pp.filter($"peer_rank" === 1L).select("period", "period_return")
      .withColumnRenamed("period_return", "top_ret")
    val above = pp.join(top, "period").filter($"period_return" > $"top_ret")
    assert(above.count() === 0)
  }

  test("historical VaR is the k-th worst observed return") {
    import spark.implicits._
    val ev  = Tables.events(spark, sf)
    val va  = TimeSeries.varHistorical(ev, 0.05)
    val ret = TimeSeries.dailyCloseReturns(ev)
    assert(va.count() > 0)
    // exactly one row per key, k = ceil(0.05 n), and the VaR value is
    // an actual observed return with exactly k returns at or below it
    assert(va.groupBy("user_id").count().filter($"count" =!= 1L).count() === 0)
    val chk = va.join(ret, "user_id")
      .groupBy($"user_id", $"var_ret", $"k")
      .agg(sum(when($"ret" <= $"var_ret", 1L).otherwise(0L)).as("n_at_or_below"))
      .filter($"n_at_or_below" < $"k")
    assert(chk.count() === 0)
  }

  test("tolerance as-of: infinite tolerance reduces to plain as-of; the staleness gate bites") {
    import spark.implicits._
    val ev    = Tables.events(spark, sf)
    val plain = TimeSeries.asOfJoin(ev, "purchase", "view")
    val inf   = TimeSeries.asOfJoinTolerance(ev, "purchase", "view", Int.MaxValue)
      .drop("asof_age_us")
    assert(inf.exceptAll(plain).count() === 0 && plain.exceptAll(inf).count() === 0)
    val tight = TimeSeries.asOfJoinTolerance(ev, "purchase", "view", 120)
    assert(tight.filter($"asof_age_us" > 120L * 60L * 1000000L).count() === 0)
    assert(tight.filter($"asof_val".isNull).count() > plain.filter($"asof_val".isNull).count())
  }

  test("portfolioTurnover: bounded in [0,1], zero for identical snapshots") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val to = TimeSeries.portfolioTurnover(ev, "2024-01-15", 10)
    assert(to.count() === 10)
    assert(to.filter($"turnover" < 0.0 || $"turnover" > 1.0).count() === 0)
    // cutoff past the data's end: both snapshots identical -> exactly 0
    val same = TimeSeries.portfolioTurnover(ev, "2025-01-01", 10)
    assert(same.filter($"turnover" =!= 0.0).count() === 0)
  }

  test("riskSnapshot: five metrics per fund, definitional benchmark beta/alpha, median in range") {
    import spark.implicits._
    val rs = TimeSeries.riskSnapshot(Tables.events(spark, sf), 0L)
    assert(rs.count() > 0)
    assert(rs.filter($"user_id" === 0L).count() === 0)
    assert(rs.select("metric").distinct().count() === 5)
    val defs = rs.select("metric", "bench_value").distinct()
      .filter($"metric" === "beta" && $"bench_value" =!= 1.0 ||
        $"metric" === "alpha" && $"bench_value" =!= 0.0)
    assert(defs.count() === 0, "benchmark beta/alpha must be definitional 1/0")
    val badMed = rs.groupBy("metric")
      .agg(min("fund_value").as("lo"), max("fund_value").as("hi"),
        first("peer_median").as("med"))
      .filter($"med" < $"lo" || $"med" > $"hi")
    assert(badMed.count() === 0)
  }

  test("indicatorTrends at quarter grain: trends and alerts follow the deltas") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-15", 10.0, """{"k":100}"""),
      (1L, "2024-02-15", 20.0, """{"k":50}"""),
      (1L, "2024-04-10", 30.0, """{"k":200}"""),
      (1L, "2024-05-10", 40.0, """{"k":10}"""),
      (1L, "2024-07-05", 5.0, """{"k":300}"""))
      .toDF("user_id", "d", "value", "props")
      .select($"user_id", to_timestamp($"d").as("ts"), $"value", $"props")
    val t = TimeSeries.indicatorTrends(df, "quarter", volLo = 5.0, volHi = 7.0)
      .orderBy("bar_start").collect()
    assert(t.length === 3)
    val navs = t.map(_.getAs[Double]("nav")).toSeq
    assert(navs === Seq(15.0, 35.0, 5.0))
    assert(t.map(_.getAs[String]("nav_trend")).toSeq === Seq(null, "up", "down"))
    assert(t.map(_.getAs[Long]("volume")).toSeq === Seq(150L, 210L, 300L))
    assert(t.map(_.getAs[String]("volume_trend")).toSeq === Seq(null, "up", "up"))
    // Q1/Q2 sample std of two points 10 apart = 7.071068 > volHi;
    // Q3 is a single observation → null volatility → green
    assert(t.map(_.getAs[String]("alert")).toSeq === Seq("red", "red", "green"))
  }

  test("beta of benchmark vs itself would be 1; sanity on others") {
    import spark.implicits._
    val ab = TimeSeries.alphaBeta(Tables.events(spark, sf), 0L)
    assert(ab.count() > 0)
    assert(ab.filter($"r_squared" < 0 || $"r_squared" > 1).count() === 0)
  }

  test("calmar, ulcer, omega match direct computations on a drawdown series") {
    import spark.implicits._
    val closes = Vector(100.0, 110.0, 99.0, 104.5, 95.0, 102.0)
    val df = closes.zipWithIndex
      .map { case (c, i) => (9L, i.toLong, i.toLong, c) }
      .toDF("user_id", "event_id", "d", "value")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
      .drop("d")
    val rets   = closes.sliding(2).map(p => p(1) / p(0) - 1).toVector
    val runMax = closes.scanLeft(Double.MinValue)(math.max).tail
    val dds    = closes.zip(runMax).map { case (c, m) => c / m - 1 }
    val annRet = rets.sum / rets.size * 252
    val maxDd  = dds.min
    val cal = TimeSeries.calmar(df).head()
    assert(math.abs(cal.getAs[Double]("ann_return") - annRet) < 1e-6)
    assert(math.abs(cal.getAs[Double]("max_drawdown") - maxDd) < 1e-6)
    assert(math.abs(cal.getAs[Double]("calmar") - annRet / -maxDd) < 1e-5)
    val ddPcts = dds.map(_ * 100)
    val ulcerW = math.sqrt(ddPcts.map(x => x * x).sum / ddPcts.size)
    val ul = TimeSeries.ulcerIndex(df).head()
    assert(ul.getAs[Long]("n_days") === closes.size.toLong)
    assert(math.abs(ul.getAs[Double]("worst_dd_pct") - ddPcts.min) < 1e-6)
    assert(math.abs(ul.getAs[Double]("ulcer_index") - ulcerW) < 1e-6)
    val om = TimeSeries.omegaRatio(df).head()
    val gains  = rets.filter(_ > 0).sum
    val losses = -rets.filter(_ < 0).sum
    assert(math.abs(om.getAs[Double]("omega") - gains / losses) < 1e-5)
    // an all-gain series has no downside: omega is null, not Inf
    val up = Vector(1.0, 2.0, 3.0).zipWithIndex
      .map { case (c, i) => (9L, i.toLong, i.toLong, c) }
      .toDF("user_id", "event_id", "d", "value")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
      .drop("d")
    assert(TimeSeries.omegaRatio(up).head().getAs[java.lang.Double]("omega") === null)
  }

  test("cusum locates a level shift in returns at the last pre-shift day") {
    import spark.implicits._
    // closes flat 100 for days 0..4, then +10%/day: returns are four
    // 0s then five 0.1s -> |S| peaks exactly at the regime boundary
    val closes = Vector.tabulate(10)(d => if (d < 5) 100.0 else 100.0 * math.pow(1.1, d - 4))
    val df = closes.zipWithIndex
      .map { case (c, i) => (7L, i.toLong, i.toLong, c) }
      .toDF("user_id", "event_id", "d", "value")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
      .drop("d")
    val got = TimeSeries.cusum(df).head()
    assert(got.getAs[String]("cp_day") === "1970-01-05")
    assert(got.getAs[Long]("n_days") === 9L)
    // mu = round(0.5/9, 6); S at the boundary = -4*mu
    assert(math.abs(got.getAs[Double]("cusum_stat") - 4 * 0.055556) < 1e-5)
    // no shift (constant returns): the statistic collapses to ~0
    val flat = Vector.tabulate(10)(d => 100.0 * math.pow(1.02, d)).zipWithIndex
      .map { case (c, i) => (8L, i.toLong, i.toLong, c) }
      .toDF("user_id", "event_id", "d", "value")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
      .drop("d")
    assert(TimeSeries.cusum(flat).head().getAs[Double]("cusum_stat") < 1e-3)
  }

  test("theil-sen: exact line recovered, single outlier does not move the slope where OLS drifts") {
    import spark.implicits._
    // exact line + one wild outlier on the last day: the pairwise-slope
    // median stays on the line, OLS does not
    val line    = Vector.tabulate(11)(i => 50.0 + 2.0 * i)
    val spiked  = line.updated(10, 500.0)
    val df = spiked.zipWithIndex
      .map { case (c, i) => (1L, i.toLong, i.toLong, c) }
      .toDF("user_id", "event_id", "d", "value")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
      .drop("d")
    val ts  = TimeSeries.theilSen(df).head()
    val ols = TimeSeries.linearTrend(df).head()
    assert(ts.getAs[Long]("n_pairs") === 55L)
    assert(ts.getAs[Double]("ts_slope") === 2.0)
    assert(ols.getAs[Double]("slope") > 4.0, "OLS should be dragged by the outlier")
  }

  test("seasonal decompose: linear trend + pure weekly pattern separate exactly, residual 0") {
    import spark.implicits._
    // close = 100 + i + s(dow): any 7 consecutive days sum the
    // pattern to 0, so trend == 100+i on interior days, seasonal
    // recovers s exactly, residual is exactly 0
    val s7 = Vector(3.0, -1.0, 2.0, -2.0, 1.0, -1.0, -2.0)
    val df = (0 until 28).map(i => (1L, i.toLong, i.toLong, 100.0 + i + s7(i % 7)))
      .toDF("user_id", "event_id", "d", "value")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
      .drop("d")
    val got = TimeSeries.seasonalDecompose(df).orderBy("day").collect()
    assert(got.length === 28)
    got.zipWithIndex.foreach { case (r, i) =>
      if (i < 3 || i >= 25) {
        assert(r.isNullAt(r.fieldIndex("trend")), s"edge day $i must have null trend")
        assert(r.isNullAt(r.fieldIndex("residual")))
      } else {
        assert(r.getAs[Double]("trend") === 100.0 + i, s"day $i trend")
        assert(r.getAs[Double]("residual") === 0.0, s"day $i residual")
      }
      // seasonal is defined for every day whose weekday has interior
      // support (all of them here, 28 = 4 full weeks)
      assert(math.abs(r.getAs[Double]("seasonal") - s7(i % 7)) < 1e-12, s"day $i seasonal")
    }
  }

  test("variance ratio: ~1 under iid noise scale, exactly computed on a hand series") {
    import spark.implicits._
    // geometric walk with alternating ±r: 1-day log returns alternate
    // +a,-a (var = a² * n/(n-1) around mean ~0); 5-day returns are a
    // or -a depending on parity — strong mean reversion => VR << 1
    val a = math.log(1.1)
    val closes = Vector.tabulate(40)(i => if (i % 2 == 0) 100.0 else 110.0)
    val df = closes.zipWithIndex
      .map { case (c, i) => (1L, i.toLong, i.toLong, c) }
      .toDF("user_id", "event_id", "d", "value")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
      .drop("d")
    val got = TimeSeries.varianceRatio(df, 5).head()
    assert(got.getAs[Long]("n_1d") === 39L)
    assert(got.getAs[Long]("n_kd") === 35L)
    // alternating returns: abs(r1) == a for every step
    assert(math.abs(got.getAs[Double]("var_1d") - a * a * 39.0 / 38.0) < 1e-4)
    assert(got.getAs[Double]("vr") < 0.5, s"mean-reverting series must show VR << 1, got $got")
  }

  test("linear trend recovers an exact line: slope, intercept, r2 = 1") {
    import spark.implicits._
    val df = Vector.tabulate(6)(i => (9L, i.toLong, i.toLong, 50.0 + 2.5 * i))
      .toDF("user_id", "event_id", "d", "value")
      .withColumn("ts", timestamp_micros(($"d" * 86400L + 3600L) * 1000000L))
      .drop("d")
    val got = TimeSeries.linearTrend(df).head()
    assert(got.getAs[Long]("n_days") === 6L)
    assert(got.getAs[Double]("slope") === 2.5)
    assert(got.getAs[Double]("intercept") === 50.0)
    assert(got.getAs[Double]("r2") === 1.0)
  }
}
