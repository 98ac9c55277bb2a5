package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics

class EventAnalyticsSpec extends AnyFunSuite {
  import TestSession._

  private def ts(day: Int, hour: Int = 1) =
    timestamp_micros(lit(1704067200000000L + day * 86400000000L + hour * 3600000000L))

  test("stickiness: dau over trailing-window actives matches the hand grid") {
    import spark.implicits._
    // user 1 active days 0-3, user 2 only day 0; window = 2 days
    val rows = Seq((1L, 0), (1L, 1), (1L, 2), (1L, 3), (2L, 0))
    val ev = rows.zipWithIndex.map { case ((u, d), i) => (i.toLong, u, d) }
      .toDF("event_id", "user_id", "d")
      .select($"event_id", $"user_id",
        timestamp_micros(lit(1704067200000000L) + $"d" * 86400000000L).as("ts"))
    val got = EventAnalytics.stickiness(ev, 2).orderBy("day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got === Array(
      ("2024-01-01", 2L, 2L, 1.0),
      ("2024-01-02", 1L, 2L, 0.5),
      ("2024-01-03", 1L, 1L, 1.0),
      ("2024-01-04", 1L, 1L, 1.0)))
  }

  test("anomaly days: a planted volume spike trips the flag, steady days stay quiet") {
    import spark.implicits._
    // type a: 12 steady days of 10 events + one day of 200
    val steady = (0 until 12).flatMap(d => (0 until 10).map(i => (d, "a", d * 100 + i)))
    val spike  = (0 until 200).map(i => (12, "a", 2000 + i))
    val ev = (steady ++ spike).zipWithIndex.map { case ((d, t, _), i) => (i.toLong, t, d) }
      .toDF("event_id", "event_type", "d")
      .select($"event_id", $"event_type",
        timestamp_micros(lit(1704067200000000L) + $"d" * 86400000000L).as("ts"))
    val got = EventAnalytics.anomalyDays(ev).collect()
      .map(r => r.getString(1) -> r).toMap
    assert(got("2024-01-13").getAs[Boolean]("anomaly"), "the 20x day must flag")
    assert(!got("2024-01-01").getAs[Boolean]("anomaly"))
    // z matches the textbook recompute off exact counts
    val ns   = Seq.fill(12)(10.0) :+ 200.0
    val mean = ns.sum / ns.length
    val vr   = ns.map(x => (x - mean) * (x - mean)).sum / (ns.length - 1)
    assert(math.abs(got("2024-01-13").getAs[Double]("z") - (200.0 - mean) / math.sqrt(vr)) < 1e-9)
  }

  test("attribution: credit conserves exactly and the remainder lands on the last touch") {
    import spark.implicits._
    val h = 3600000000L
    val rows = Seq(
      // user 1: three touches then a purchase -> 1e6/3 each, +1 to the click (last)
      (1L, "view", 0L), (1L, "view", 1L * h), (1L, "click", 2L * h), (1L, "purchase", 3L * h),
      // user 2: one touch OUTSIDE the 168h lookback -> (direct)
      (2L, "view", 0L), (2L, "purchase", 200L * h),
      // user 3: purchase with no touches at all -> (direct)
      (3L, "purchase", 5L * h))
    val ev = rows.zipWithIndex.map { case ((u, t, off), i) => (i.toLong, u, t, off) }
      .toDF("event_id", "user_id", "event_type", "off")
      .select($"event_id", $"user_id", $"event_type",
        timestamp_micros(lit(1704067200000000L) + $"off").as("ts"))
    val got = EventAnalytics.attribution(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("view").getAs[Long]("credit_micro") === 666666L, "two floor shares of 1e6/3")
    assert(got("click").getAs[Long]("credit_micro") === 333334L, "floor share + remainder (last touch)")
    assert(got("(direct)").getAs[Long]("n_conversions") === 2L)
    assert(got("(direct)").getAs[Long]("credit_micro") === 2000000L)
    // conservation: total micro-credit == 1e6 x conversions, exactly
    assert(got.values.map(_.getAs[Long]("credit_micro")).sum === 3L * 1000000L)
  }

  test("funnel windowed: only conversions inside the horizon count, mean lag exact") {
    import spark.implicits._
    val rows = Seq(
      (1L, "view", 0L), (1L, "purchase", 3600000000L),            // 60 min: inside 72h
      (2L, "view", 0L), (2L, "purchase", 100L * 3600000000L),     // 100h: outside
      (3L, "view", 0L)                                            // never converts
    )
    val ev = rows.zipWithIndex.map { case ((u, t, off), i) => (i.toLong, u, t, off) }
      .toDF("event_id", "user_id", "event_type", "off")
      .select($"event_id", $"user_id", $"event_type",
        timestamp_micros(lit(1704067200000000L) + $"off").as("ts"))
    val got = EventAnalytics.funnelWindowed(ev, 72).head()
    assert(got.getAs[Long]("n_entered") === 3L)
    assert(got.getAs[Long]("n_converted") === 1L)
    assert(got.getAs[Double]("conv_rate") === 1.0 / 3.0)
    assert(got.getAs[Double]("mean_lag_min") === 60.0)
  }

  test("cohort retention matches a hand-built matrix") {
    import spark.implicits._
    // user 1 first on day 0, active days 0,1,3; user 2 first day 0,
    // active 0,2; user 3 first day 1, active 1 only
    val rows = Seq((1L, 0), (1L, 1), (1L, 3), (2L, 0), (2L, 2), (3L, 1))
    val ev = rows.zipWithIndex.map { case ((u, d), i) => (i.toLong, u, d) }
      .toDF("event_id", "user_id", "d")
      .select($"event_id", $"user_id", ts(0).as("base"), $"d")
      .select($"event_id", $"user_id",
        timestamp_micros(unix_micros($"base") + $"d" * 86400000000L).as("ts"))
    val got = EventAnalytics.cohortRetention(ev)
      .withColumn("cohort", date_format($"cohort", "yyyy-MM-dd"))
      .orderBy($"cohort", $"day_offset")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val want = Seq(
      ("2024-01-01", 0L, 2L, 2L, 1.0),
      ("2024-01-01", 1L, 1L, 2L, 0.5),
      ("2024-01-01", 2L, 1L, 2L, 0.5),
      ("2024-01-01", 3L, 1L, 2L, 0.5),
      ("2024-01-02", 0L, 1L, 1L, 1.0))
    assert(got.toSeq === want)
  }

  test("funnel enforces event ORDER, not mere presence") {
    import spark.implicits._
    // A: view -> click -> purchase in order (full conversion)
    // B: click BEFORE its first view, no purchase (stalls at view)
    // C: view only
    val rows = Seq(
      (1L, "view", 0), (1L, "click", 1), (1L, "purchase", 2),
      (2L, "click", 0), (2L, "view", 1),
      (3L, "view", 0))
    val ev = rows.zipWithIndex.map { case ((u, t, h), i) => (i.toLong, u, t, h) }
      .toDF("event_id", "user_id", "event_type", "h")
      .select($"event_id", $"user_id", $"event_type",
        timestamp_micros(lit(1704067200000000L) + $"h" * 3600000000L).as("ts"))
    val got = EventAnalytics.funnel(ev).orderBy($"stage").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val want = Seq(
      (1L, "view", 3L, 1.0, 1.0),
      (2L, "click", 1L, BigDecimal(1.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(1.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
      (3L, "purchase", 1L, 1.0,
        BigDecimal(1.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(got.toSeq === want)
    // same-timestamp boundary: a click AT the first view's instant
    // counts (>= semantics)
    val tie = Seq((9L, 5L, "view", 0), (10L, 5L, "click", 0))
      .toDF("event_id", "user_id", "event_type", "h")
      .select($"event_id", $"user_id", $"event_type",
        timestamp_micros(lit(1704067200000000L) + $"h" * 3600000000L).as("ts"))
    val tieRow = EventAnalytics.funnel(tie).filter($"stage" === 2).head()
    assert(tieRow.getLong(2) === 1L, "click at the view instant must convert")
  }

  test("fixture run: counts monotone down the funnel, retention bounded") {
    import spark.implicits._
    val ev  = Tables.events(spark, sf)
    val fun = EventAnalytics.funnel(ev).orderBy($"stage").collect()
    assert(fun.length === 3)
    assert(fun.sliding(2).forall(p => p(0).getLong(2) >= p(1).getLong(2)),
      "funnel counts must be non-increasing")
    val ret = EventAnalytics.cohortRetention(ev)
    assert(ret.filter($"retention" <= 0 || $"retention" > 1).count() === 0)
    assert(ret.filter($"day_offset" < 0).count() === 0,
      "an active day precedes its user's cohort day")
  }

  test("session stats conserve events and durations are consistent") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val st = EventAnalytics.sessionStats(ev)
    // every event lands in exactly one session of exactly one user
    assert(st.agg(sum($"total_events")).head().getLong(0) === ev.count())
    assert(st.filter($"max_session_events" > $"total_events").count() === 0)
    assert(st.filter($"total_session_us" < 0).count() === 0)
    assert(st.filter($"n_sessions" < 1).count() === 0)
  }

  test("transition edges conserve: total transitions = events minus active users") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    // each user's time-ordered stream of n events yields n-1 edges
    val totalEdges = EventAnalytics.topTransitions(ev, k = 1000000)
      .agg(sum($"n_transitions")).head().getLong(0)
    val want = ev.count() - ev.select($"user_id").distinct().count()
    assert(totalEdges === want)
  }

  test("time-to-conversion honors the ordered >= boundary") {
    import spark.implicits._
    // user 1: purchase BEFORE first view -> no conversion from that
    // purchase; a later purchase at the same ts as the view converts
    val rows = Seq(
      (1L, "purchase", 0), (1L, "view", 2), (1L, "purchase", 2), // ties convert (>=)
      (2L, "view", 0), (2L, "purchase", 5),
      (3L, "purchase", 1),                                        // no view: absent
      (4L, "view", 3))                                            // no purchase: absent
    val ev = rows.zipWithIndex.map { case ((u, t, d), i) => (i.toLong, u, t, d) }
      .toDF("event_id", "user_id", "event_type", "d")
      .select($"event_id", $"user_id", $"event_type",
        timestamp_micros(lit(1704067200000000L) + $"d" * 86400000000L).as("ts"))
    val got = EventAnalytics.timeToConversion(ev).orderBy($"user_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("delta_us")))
    assert(got.toSeq === Seq((1L, 0L), (2L, 5L * 86400000000L)))
  }

  private def activityDf = {
    import spark.implicits._
    // user 1 active days 0,1,8; user 2 days 0,7; user 3 day 7 only
    val rows = Seq((1L, 0), (1L, 1), (1L, 8), (2L, 0), (2L, 7), (3L, 7))
    rows.zipWithIndex.map { case ((u, d), i) => (i.toLong, u, d) }
      .toDF("event_id", "user_id", "d")
      .select($"event_id", $"user_id",
        timestamp_micros(lit(1704067200000000L) + $"d" * 86400000000L).as("ts"))
  }

  test("rolling active users: WAU is the trailing-window distinct; windowDays=1 collapses to DAU") {
    import spark.implicits._
    val got = EventAnalytics.rollingActiveUsers(activityDf, 7)
      .withColumn("grid_day", date_format($"grid_day", "yyyy-MM-dd"))
      .orderBy($"grid_day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // day 0: users {1,2}; day 1: {1}, window {0,1} -> {1,2}
    // day 7: {2,3}, window 1..7 -> {1(d1),2,3}; day 8: {1}, window 2..8 -> {1,2,3}
    assert(got.toSeq === Seq(
      ("2024-01-01", 2L, 2L, 1.0),
      ("2024-01-02", 1L, 2L, 0.5),
      ("2024-01-08", 2L, 3L, 2.0 / 3),
      ("2024-01-09", 1L, 3L, 1.0 / 3)))
    val collapsed = EventAnalytics.rollingActiveUsers(activityDf, 1).collect()
    collapsed.foreach { r =>
      assert(r.getAs[Long]("dau") === r.getAs[Long]("wau"))
      assert(r.getAs[Double]("stickiness") === 1.0)
    }
  }

  test("new vs returning partitions each day's actives by first-seen day") {
    import spark.implicits._
    val got = EventAnalytics.newVsReturning(activityDf)
      .withColumn("d", date_format($"d", "yyyy-MM-dd"))
      .orderBy($"d").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 2L, 0L),   // users 1,2 first seen
      ("2024-01-02", 0L, 1L),   // user 1 returns
      ("2024-01-08", 1L, 1L),   // user 3 new, user 2 returns
      ("2024-01-09", 0L, 1L)))  // user 1 returns
    // conservation: total new across days == distinct users
    assert(got.map(_._2).sum === 3L)
  }

  test("power users: rank order, exact cumulative shares, the midpoint flag cuts where it should") {
    import spark.implicits._
    // counts 6,3,1 over ten events: user 1 alone crosses the 50%
    // boundary; users 2,3 start at/after it
    val ev = (Seq.fill(6)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L))
      .zipWithIndex.map { case (u, i) => (i.toLong, u, "view") }
      .toDF("event_id", "user_id", "event_type")
      .withColumn("ts", ts(0))
    val got = EventAnalytics.powerUsers(ev, nBuckets = 2).orderBy($"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5)))
    assert(got.toSeq === Seq(
      (1L, 6L, 1L, 6L, 0.6, 1),
      (2L, 3L, 2L, 9L, 0.9, 0),
      (3L, 1L, 3L, 10L, 1.0, 0)))
    // fixture invariants at any bucket count: last cum_share is 1,
    // cumsum strictly increasing in rank order
    val fx = EventAnalytics.powerUsers(Tables.events(spark, TestSession.sf)).orderBy($"rank").collect()
    assert(fx.last.getAs[Double]("cum_share") === 1.0)
    assert(fx.sliding(2).forall(p => p(0).getAs[Long]("cum_events") < p(1).getAs[Long]("cum_events")))
    assert(fx.map(_.getAs[Long]("rank")).toSeq === (1L to fx.length).toSeq)
  }

  test("churn: horizon splits quiet users from active, cohorts partition the population") {
    import spark.implicits._
    // corpus ends day 9; user 1 active to the end, user 2 quiet since
    // day 2, user 3 (cohort day 1) quiet since day 5
    val rows = Seq((1L, 0), (1L, 9), (2L, 0), (2L, 2), (3L, 1), (3L, 5))
    val ev = rows.zipWithIndex.map { case ((u, d), i) => (i.toLong, u, d) }
      .toDF("event_id", "user_id", "d")
      .select($"event_id", $"user_id",
        timestamp_micros(unix_micros(ts(0)) + $"d" * 86400000000L).as("ts"))
    val got = EventAnalytics.churn(ev, horizonDays = 3, cohortGrain = "day")
      .withColumn("cohort_week", date_format($"cohort_week", "yyyy-MM-dd"))
      .orderBy($"cohort_week").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 2L, 1L, 0.5),   // users 1 (active) and 2 (churned)
      ("2024-01-02", 1L, 1L, 1.0)))  // user 3 churned (4 days quiet)
  }

  test("inter-event gaps: exact micro gaps, interpolated quantiles, tie-broken ordering") {
    import spark.implicits._
    // user 1 gaps: 60s, 180s, 600s; same-instant tie orders on event_id
    val ev = Seq((1L, 1L, 0L), (2L, 1L, 60L), (3L, 1L, 240L), (4L, 1L, 840L))
      .toDF("event_id", "user_id", "s")
      .select($"event_id", $"user_id",
        timestamp_micros(unix_micros(ts(0)) + $"s" * 1000000L).as("ts"))
    val r = EventAnalytics.interEventGaps(ev).head()
    assert(r.getAs[Long]("n_gaps") === 3L)
    assert(r.getAs[Double]("median_gap_us") === 180.0e6)
    // p90 over [60,180,600]s: idx 1.8 -> 180 + 0.8*420 = 516s
    assert(r.getAs[Double]("p90_gap_us") === 516.0e6)
    assert(r.getAs[Long]("max_gap_us") === 600000000L)
  }

  test("hourly profile: shares sum to 1 over a bounded 7x24 grid, hand-placed events land") {
    import spark.implicits._
    // 2024-01-01 is a Monday: isodow 1; hours 9 and 23
    val ev = Seq((1L, 1L, "2024-01-01T09:15:00Z"), (2L, 1L, "2024-01-01T09:45:00Z"),
      (3L, 2L, "2024-01-02T23:00:00Z"))
      .toDF("event_id", "user_id", "iso")
      .select($"event_id", $"user_id", to_timestamp($"iso").as("ts"))
    val got = EventAnalytics.hourlyProfile(ev).orderBy($"isodow", $"hour").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq((1, 9, 2L, 0.666667), (2, 23, 1L, 0.333333)))
    val fx = EventAnalytics.hourlyProfile(Tables.events(spark, TestSession.sf)).collect()
    assert(fx.length <= 168)
    assert(math.abs(fx.map(_.getAs[Double]("share")).sum - 1.0) < 1e-3)
  }

  test("gini: 0 for a uniform population, hand-computed for a concentrated one") {
    import spark.implicits._
    def ev(counts: Seq[Int]) = counts.zipWithIndex.flatMap { case (c, u) =>
      (0 until c).map(j => ((u * 1000 + j).toLong, u.toLong + 1, "view")) }
      .toDF("event_id", "user_id", "event_type").withColumn("ts", ts(0))
    val uniform = EventAnalytics.gini(ev(Seq(5, 5, 5, 5))).head()
    assert(uniform.getAs[Double]("gini") === 0.0)
    // counts [1,1,1,97]: G = 2*394/(4*100) - 5/4 = 0.72
    val skewed = EventAnalytics.gini(ev(Seq(1, 1, 1, 97))).head()
    assert(skewed.getAs[Long]("n_users") === 4L)
    assert(skewed.getAs[Long]("total_events") === 100L)
    assert(skewed.getAs[Double]("gini") === 0.72)
  }

  test("survival curve: reverse-cumulative lifespans, monotone, starts at 1.0 coverage") {
    import spark.implicits._
    // lifespans: users 1,2 -> 0 days; user 3 -> 3; user 4 -> 5
    val rows = Seq((1L, 0, 0), (2L, 2, 2), (3L, 0, 3), (4L, 1, 6))
    val ev = rows.zipWithIndex.flatMap { case ((u, d0, d1), i) =>
      Seq((i.toLong * 2, u, d0), (i.toLong * 2 + 1, u, d1)) }
      .toDF("event_id", "user_id", "d")
      .select($"event_id", $"user_id",
        timestamp_micros(unix_micros(ts(0)) + $"d" * 86400000000L).as("ts"))
    val got = EventAnalytics.survivalCurve(ev).orderBy($"day_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (0L, 2L, 4L, 1.0),
      (3L, 1L, 2L, 0.5),
      (5L, 1L, 1L, 0.25)))
  }

  test("behavior entropy: 0 for single-type users, log2(k) for a uniform k-type mix") {
    import spark.implicits._
    val ev = (Seq.fill(2)((1L, "view")) ++ Seq.fill(2)((1L, "click")) ++
      Seq.fill(4)((2L, "view")) ++
      Seq("view", "click", "purchase", "share").map((3L, _)))
      .zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
      .toDF("event_id", "user_id", "event_type")
      .withColumn("ts", ts(0))
    val got = EventAnalytics.behaviorEntropy(ev).orderBy($"user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 4L, 2L, 1.0), (2L, 4L, 1L, 0.0), (3L, 4L, 4L, 2.0)))
  }

  test("burstiness: a metronome reads exactly -1, a bursty user reads positive") {
    import spark.implicits._
    // user 1: perfectly regular 60s gaps; user 2: many 1s gaps + one huge gap
    val reg = (0 until 20).map(i => (1L, i.toLong, i.toLong * 60L))
    val bur = ((0 until 19).map(i => (2L, 100L + i, i.toLong)) :+ (2L, 119L, 100000L))
    val df = (reg ++ bur).toDF("user_id", "event_id", "t_s")
      .withColumn("ts", timestamp_micros($"t_s" * 1000000L))
    val got = EventAnalytics.burstiness(df).collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Double]("burstiness") === -1.0, "zero variance is the metronome pole")
    assert(math.abs(got(1L).getAs[Double]("mean_gap_s") - 60.0) < 1e-9)
    assert(got(2L).getAs[Double]("burstiness") > 0.5, "one huge gap must read bursty")
  }

  test("markov stationary: an absorbing state takes all fixed-point mass exactly") {
    import spark.implicits._
    // every user: A then B,B,B -> edges A->B and B->B only; B absorbs
    val rows = (1L to 4L).flatMap { u =>
      Seq("A", "B", "B", "B").zipWithIndex.map { case (t, i) => (u * 10 + i, u, i, t) }
    }
    val ev = rows.toDF("event_id", "user_id", "h", "event_type")
      .withColumn("ts", timestamp_micros(lit(1704067200000000L) + $"h" * 3600000000L))
    val got = EventAnalytics.markovStationary(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("A")._1 === 0L, "the transient state must drain completely")
    assert(got("B")._1 === 1000000000000L, "the absorbing state holds ALL fixed-point units")
    assert(got("B")._2 === 1.0)
    // determinism: a second run is bit-identical (integer fixed point)
    val again = EventAnalytics.markovStationary(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === got.map { case (k, v) => k -> v._1 })
  }

  test("top paths: order by time not arrival, depth cap applied, counts grouped") {
    import spark.implicits._
    // user 1 and 2 share view>click>buy; user 3 is click>view; user 4
    // has 7 events but only the first 5 form the path
    val rows = Seq(
      (1L, Seq("view", "click", "buy")),
      (2L, Seq("view", "click", "buy")),
      (3L, Seq("click", "view")),
      (4L, Seq("a", "b", "c", "d", "e", "f", "g")))
    // emit events REVERSED so arrival order differs from event time
    val ev = rows.flatMap { case (u, seq) =>
      seq.zipWithIndex.reverseIterator.map { case (t, i) => (u * 100 + i, u, i, t) }
    }.toDF("event_id", "user_id", "h", "event_type")
      .withColumn("ts", timestamp_micros(lit(1704067200000000L) + $"h" * 3600000000L))
    val got = EventAnalytics.topPaths(ev, 5, 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("view>click>buy") === 2L)
    assert(got("click>view") === 1L)
    assert(got("a>b>c>d>e") === 1L, s"depth cap must keep the first 5: $got")
    assert(got.size === 3)
  }

  test("user features: hand-built tenure/recency/means, one row per user") {
    import spark.implicits._
    // user 1: days 0,0,2 (two events day 0) values 10,20,30; user 2: day 4 value 8
    val rows = Seq(
      (1L, 0, 1, "view", 10.0), (1L, 0, 2, "click", 20.0), (1L, 2, 1, "view", 30.0),
      (2L, 4, 1, "buy", 8.0))
    val ev = rows.zipWithIndex.map { case ((u, d, h, t, x), i) => (i.toLong, u, d, h, t, x) }
      .toDF("event_id", "user_id", "d", "h", "event_type", "value")
      .withColumn("ts", timestamp_micros(lit(1704067200000000L) +
        $"d" * 86400000000L + $"h" * 3600000000L))
    val got = EventAnalytics.userFeatures(ev).orderBy($"user_id").collect()
    val u1 = got(0)
    assert(u1.getAs[Long]("n_events") === 3L && u1.getAs[Long]("n_days_active") === 2L)
    assert(u1.getAs[Long]("n_types") === 2L)
    assert(u1.getAs[Long]("tenure_days") === 2L, "day 0 to day 2")
    assert(u1.getAs[Long]("recency_days") === 2L, "corpus end day 4 minus last day 2")
    assert(u1.getAs[Double]("mean_value") === 20.0)
    assert(u1.getAs[Double]("events_per_day") === 1.0, "3 events over 3 calendar days")
    val u2 = got(1)
    assert(u2.getAs[Long]("tenure_days") === 0L && u2.getAs[Long]("recency_days") === 0L)
    assert(u2.getAs[Double]("mean_value") === 8.0)
    assert(got.length === 2)
  }

  test("entropy rate: a deterministic cycle reads H(next|prev)=0 and info gain = H(next)") {
    import spark.implicits._
    // one user walking A->B->C->A->... : next is fully determined by
    // prev, marginals uniform over 3 states
    val types = Seq("A", "B", "C")
    val rows = (0 until 30).map(i => (1L, i.toLong, types(i % 3), i.toLong))
    val df = rows.toDF("user_id", "event_id", "event_type", "t")
      .withColumn("ts", timestamp_micros($"t" * 1000000L))
    val r = graft.operators.EventAnalytics.entropyRate(df).head()
    assert(r.getAs[Long]("n_transitions") === 29L)
    assert(r.getAs[Long]("n_states") === 3L)
    assert(r.getAs[Double]("h_cond_bits") === 0.0, "a deterministic chain carries no surprise")
    val hNext = r.getAs[Double]("h_next_bits")
    assert(math.abs(hNext - math.log(3) / math.log(2)) < 1e-2,
      s"marginal entropy must be ~log2(3), got $hNext")
    assert(r.getAs[Double]("info_gain_bits") === hNext)
  }

  test("lorenz curve: counts 1..10 give the exact triangular cumulative shares") {
    import spark.implicits._
    // user u emits u events: decile d holds exactly user d, cum = d(d+1)/2 of 55
    val rows = (1 to 10).flatMap(u => (0 until u).map(j =>
      (u.toLong, u.toLong * 100 + j, u.toLong * 3600 + j * 60L, "e")))
    val df = rows.toDF("user_id", "event_id", "t_s", "event_type")
      .withColumn("ts", timestamp_micros($"t_s" * 1000000L)).drop("t_s")
    val got = EventAnalytics.lorenzCurve(df).orderBy("decile").collect()
    assert(got.length === 10)
    got.zipWithIndex.foreach { case (r, i) =>
      val d = i + 1
      assert(r.getAs[Long]("n_users_in") === 1L, s"decile $d")
      assert(r.getAs[Long]("cum_events") === d.toLong * (d + 1) / 2, s"decile $d cum")
      assert(r.getAs[Double]("cum_share") === (d.toLong * (d + 1) / 2).toDouble / 55.0, s"decile $d share")
    }
  }

  test("activation lag: endpoints exact, the never-activated user counted, percentiles interpolate") {
    import spark.implicits._
    // A: 12 events 1 min apart (t10 - t1 = 540 s); B: 5 events (never
    // activates); C: 10 events 1 h apart (t10 - t1 = 32400 s)
    val rows = (0 until 12).map(j => (1L, 100L + j, j * 60L, "e")) ++
      (0 until 5).map(j => (2L, 200L + j, j * 60L, "e")) ++
      (0 until 10).map(j => (3L, 300L + j, j * 3600L, "e"))
    val df = rows.toDF("user_id", "event_id", "t_s", "event_type")
      .withColumn("ts", timestamp_micros($"t_s" * 1000000L)).drop("t_s")
    val got = EventAnalytics.activationLag(df).head()
    assert(got.getAs[Long]("n_users") === 3L && got.getAs[Long]("n_activated") === 2L)
    assert(got.getAs[Double]("activation_rate") === 2.0 / 3.0)
    assert(got.getAs[Double]("p50_lag_s") === (540.0 + 32400.0) / 2)
    assert(got.getAs[Double]("max_lag_s") === 32400.0)
  }

  test("peak concurrency: overlapping sessions count at once; the off-day reads its own peak") {
    import spark.implicits._
    // three sessions on day 1: [10:00,10:10], [10:05,10:15], [10:12,10:20]
    // -> peak 2; one session on day 2 -> peak 1
    def sess(uid: Long, d: Int, h0: Int, m0: Int, m1: Int) =
      Seq((uid, uid * 10, d * 86400L + h0 * 3600L + m0 * 60L, "e"),
        (uid, uid * 10 + 1, d * 86400L + h0 * 3600L + m1 * 60L, "e"))
    val rows = sess(1L, 1, 10, 0, 10) ++ sess(2L, 1, 10, 5, 15) ++
      sess(3L, 1, 10, 12, 20) ++ sess(4L, 2, 9, 0, 30)
    val df = rows.toDF("user_id", "event_id", "t_s", "event_type")
      .withColumn("ts", timestamp_micros($"t_s" * 1000000L))
      .withColumn("value", lit(1.0)).drop("t_s")
    val got = EventAnalytics.peakConcurrency(df).orderBy("day").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Long]("peak_concurrency") === 2L, "two sessions overlap on day 1")
    assert(got(1).getAs[Long]("peak_concurrency") === 1L)
  }

  test("dispersion index: a metronome feed reads fano exactly 0, a one-hour burst reads the hand D") {
    import spark.implicits._
    // corpus spans hours 0..4; steady = 1 event/hour, burst = 10 events all in hour 0
    val steady = (0 until 5).map(h => (1L, h.toLong, h.toLong * 3600L + 60L, "steady"))
    val burst  = (0 until 10).map(i => (2L, 100L + i, 120L + i, "burst"))
    val df = (steady ++ burst).toDF("user_id", "event_id", "t_s", "event_type")
      .withColumn("ts", timestamp_micros($"t_s" * 1000000L)).drop("t_s")
    val got = EventAnalytics.dispersionIndex(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val s = got("steady")
    assert(s.getAs[Long]("n_hours") === 5L && s.getAs[Long]("n_events") === 5L)
    assert(s.getAs[Double]("fano") === 0.0, "constant hourly counts have zero variance")
    val b = got("burst")
    // counts (10,0,0,0,0): D = (5*100 - 100) / (4*10) = 10 exactly
    assert(b.getAs[Long]("n_hours") === 5L, "empty hours must count as zeros")
    assert(b.getAs[Double]("fano") === 10.0)
    assert(b.getAs[Double]("chi2_stat") === 40.0)
  }
}
