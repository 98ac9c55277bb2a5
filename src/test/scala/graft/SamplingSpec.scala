package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  import TestSession._

  test("hash sample is deterministic and near the target rate") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val a  = Sampling.hashSample(ev, "event_id", 10)
    val b  = Sampling.hashSample(ev, "event_id", 10)
    assert(a.exceptAll(b).count() === 0)
    val rate = a.count().toDouble / ev.count()
    assert(rate > 0.05 && rate < 0.15, s"sample rate $rate far from 10%")
  }

  test("dataset split covers every row exactly once with sane proportions") {
    import spark.implicits._
    val ev    = Tables.events(spark, sf)
    val split = Sampling.datasetSplit(ev, "event_id")
    assert(split.count() === ev.count())
    val frac = split.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / ev.count()).toMap
    assert(frac("train") > 0.8 && frac.getOrElse("val", 0.0) < 0.15 && frac.getOrElse("test", 0.0) < 0.15)
  }

  test("domain mix hits each source's target rate and passes others through") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val mixed = Sampling.domainMix(docs, Map("src0" -> 0, "src1" -> 30))
    // rate 0 removes the source entirely; unlisted sources untouched
    assert(mixed.filter($"source" === "src0").count() === 0)
    val others     = docs.filter($"source" =!= "src0" && $"source" =!= "src1").count()
    val othersKept = mixed.filter($"source" =!= "src0" && $"source" =!= "src1").count()
    assert(othersKept === others)
    // the sampled source lands near its target rate
    val s1      = docs.filter($"source" === "src1").count().toDouble
    val s1kept  = mixed.filter($"source" === "src1").count().toDouble
    assert(s1kept / s1 > 0.05 && s1kept / s1 < 0.6, s"src1 keep rate ${s1kept / s1}")
    // deterministic: same call, same sample
    assert(Sampling.domainMix(docs, Map("src0" -> 0, "src1" -> 30))
      .exceptAll(mixed).count() === 0)
  }

  test("stratified sample returns exactly n per stratum") {
    import spark.implicits._
    val s = Sampling.stratifiedSample(Tables.events(spark, sf), "event_type", "event_id", 20)
    val counts = s.groupBy($"event_type").count().collect().map(_.getLong(1))
    assert(counts.forall(_ === 20L))
  }

  test("token budget sample stays under budget per source and is prefix-closed") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val kept = Sampling.tokenBudgetSample(docs, 400)
    // budget respected: every source's max cumulative count <= budget
    val maxCum = kept.groupBy($"source").agg(max($"cum_tok").as("m")).collect()
    assert(maxCum.nonEmpty && maxCum.forall(_.getAs[Long]("m") <= 400L))
    // prefix-closed in the budget: a larger budget keeps a superset
    val keptBig = Sampling.tokenBudgetSample(docs, 800)
    assert(kept.select("doc_id").exceptAll(keptBig.select("doc_id")).count() === 0)
    // deterministic
    assert(Sampling.tokenBudgetSample(docs, 400).exceptAll(kept).count() === 0)
  }

  test("rate-based token budget lands near the budget with zero sort") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val kept = Sampling.tokenBudgetSampleRate(docs, 400)
    // expectation-level budget: per-source kept tokens within a wide
    // band of the target (the variance is the declared trade)
    val perSrc = kept.groupBy($"source").agg(sum($"n_tok").as("tk")).collect()
    assert(perSrc.nonEmpty && perSrc.forall { r =>
      val tk = r.getAs[Long]("tk"); tk > 50L && tk < 1200L
    }, s"rate sample far off budget: ${perSrc.mkString(",")}")
    // a budget >= the source total keeps everything (rate caps at 1)
    val all = Sampling.tokenBudgetSampleRate(docs, 1000000)
    assert(all.count() === docs.count())
    // no Sort or Window in the plan: the whole point of the variant
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort") && !plan.contains("Window"),
      s"rate variant must not sort:\n$plan")
  }

  test("weighted sample returns exactly k, deterministic, skewed to heavy weights") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val wcol = size(split($"text", " "))
    val a = Sampling.weightedSample(docs, "doc_id", wcol, k = 50)
    assert(a.count() === 50)
    // deterministic: a re-run draws the identical winner set
    val b = Sampling.weightedSample(docs, "doc_id", wcol, k = 50)
    assert(a.exceptAll(b).count() === 0)
    // selection skews toward heavy weights (P(win) ~ w): on a frame
    // where 10% of rows carry 100x weight (10x the total mass of the
    // rest), the winner set should be dominated by the heavy rows
    val skewed = spark.range(1000).select($"id".as("doc_id"),
      when($"id" < 100, 100).otherwise(1).as("wt"))
    val winners = Sampling.weightedSample(skewed, "doc_id", $"wt", k = 50)
    val heavyWon = winners.filter($"w" === 100).count()
    assert(heavyWon >= 40, s"only $heavyWon/50 winners from the heavy 10%")
    // the internal clamp bounds the race-key cost: a pathological
    // weight (1e9) must behave exactly like maxWeight
    val heavy = docs.limit(20)
    val clamped  = Sampling.weightedSample(heavy, "doc_id", lit(1000000000L), k = 5)
    val atCap    = Sampling.weightedSample(heavy, "doc_id", lit(1000), k = 5)
    assert(clamped.select("doc_id", "race").exceptAll(atCap.select("doc_id", "race")).count() === 0)
  }

  test("temperature mix hits per-source targets and surfaces saturation") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val mixed = Sampling.temperatureMix(docs, targetDocs = 200)
    assert(Sampling.temperatureMix(docs, 200).exceptAll(mixed).count() === 0)
    // per-source kept counts land near target_n (hash-threshold
    // variance is the declared trade; saturated sources keep all)
    val per = mixed.groupBy($"source")
      .agg(count(lit(1)).as("kept"), first($"target_n").as("t"),
        first($"n_src").as("n"), first($"saturated").as("sat"))
      .collect()
    assert(per.nonEmpty)
    per.foreach { r =>
      val (kept, t, n, sat) = (r.getAs[Long]("kept"), r.getAs[Long]("t"),
        r.getAs[Long]("n"), r.getAs[Boolean]("sat"))
      if (sat) assert(kept === n, s"saturated source must keep everything: $r")
      else assert(math.abs(kept - t) <= math.max(6L, t / 2),
        s"kept $kept far from target $t: $r")
    }
    // a huge target saturates EVERY source at keep-all, flagged as such
    val all = Sampling.temperatureMix(docs, targetDocs = 1000000)
    assert(all.count() === docs.count())
    assert(all.filter(!$"saturated").count() === 0)
  }

  test("rational-alpha mix computes exact integer roots, incl. the perfect-power boundary") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val m = Sampling.temperatureMixAlpha(docs, targetDocs = 200)
    // the defining characterization, checked in exact BigInt math:
    // w^q <= n^p < (w+1)^q for every source
    m.select($"n_src", $"w").distinct().collect().foreach { r =>
      val (n, w) = (BigInt(r.getLong(0)), BigInt(r.getLong(1)))
      assert(w.pow(10) <= n.pow(3) && n.pow(3) < (w + 1).pow(10),
        s"w=$w is not floor(n^0.3) for n=$n")
    }
    // perfect-power boundary: n = 1024 = 2^10 has n^0.3 exactly 8
    // (8^10 == 2^30); a float-pow seed off by one ulp in either
    // direction must still land on 8 via the exact window
    val pp = (1L to 1024L).map(i => (i, "one")).toDF("doc_id", "source")
    val w1024 = Sampling.temperatureMixAlpha(pp, targetDocs = 10)
      .select($"w").head.getLong(0)
    assert(w1024 === 8L, s"floor(1024^(3/10)) must be exactly 8, got $w1024")
    // alpha=0.3 damps harder than alpha=0.5: the rational-alpha
    // weights are <= the sqrt weights for every source with n >= 1
    val half = Sampling.temperatureMix(docs, 200)
      .select($"source", $"w".as("w_half")).distinct()
    val both = m.select($"source", $"w").distinct().join(half, "source")
    assert(both.filter($"w" > $"w_half").count() === 0)
  }

  test("k-anonymity: class sizes, at-risk flags, and corpus shares are exact on a hand corpus") {
    import spark.implicits._
    // 5 docs land in one (en, web, bucket 1) class, 2 in (fr, web, 0)
    val docs = ((1 to 5).map(i => (i.toLong, "en", "web", 150L)).toList ++
      List((6L, "fr", "web", 40L), (7L, "fr", "web", 99L)))
      .toDF("doc_id", "lang", "source", "n_chars")
    val got = Sampling.kAnonymity(docs, k = 5).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r).toMap
    assert(got.size === 2)
    val big = got(("en", "web", 1L)); val small = got(("fr", "web", 0L))
    assert(big.getAs[Long]("class_size") === 5L && !big.getAs[Boolean]("at_risk"),
      "a class of exactly k is safe")
    assert(small.getAs[Long]("class_size") === 2L && small.getAs[Boolean]("at_risk"))
    assert(big.getAs[Double]("corpus_share") === 5.0 / 7)
    assert(small.getAs[Double]("corpus_share") === 2.0 / 7)
  }

  test("importance weights: cross-multiplied exact ratios rebalance a skewed feed to the corpus mix") {
    import spark.implicits._
    // s1: 3 en + 1 zh, s2: 1 en + 3 zh -> corpus is 50/50
    val docs = (
      (1 to 3).map(i => (i.toLong, "t", "en", "s1")) ++ Seq((4L, "t", "zh", "s1")) ++
        Seq((5L, "t", "en", "s2")) ++ (6 to 8).map(i => (i.toLong, "t", "zh", "s2"))
      ).toDF("doc_id", "text", "lang", "source")
    val got = graft.operators.Sampling.importanceWeights(docs).collect()
      .map(r => (r.getString(r.fieldIndex("source")), r.getString(r.fieldIndex("lang"))) -> r).toMap
    assert(got(("s1", "en")).getAs[Double]("weight") === 16.0 / 24.0)
    assert(got(("s1", "zh")).getAs[Double]("weight") === 2.0, "under-delivered lang oversamples")
    assert(got(("s2", "en")).getAs[Double]("weight") === 2.0)
    assert(got(("s2", "zh")).getAs[Double]("weight") === 16.0 / 24.0)
    assert(got.values.forall(!_.getAs[Boolean]("clipped")))
  }

  test("effective sample size: uniform weights read ESS = n exactly; reweighting shrinks it") {
    import spark.implicits._
    val uni = (1 to 6).map(i => (i.toLong, "t", "en", if (i <= 3) "s1" else "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val g1 = graft.operators.Sampling.effectiveSampleSize(uni).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(g1("s1").getAs[Double]("ess") === 3.0, "single-lang corpus: every weight is 1")
    assert(g1("s1").getAs[Double]("ess_ratio") === 1.0)
    // skewed: s1 = 3 en + 1 zh gets weights (2/3, 2) -> ESS < 4
    val skew = ((1 to 3).map(i => (i.toLong, "t", "en", "s1")) ++ Seq((4L, "t", "zh", "s1")) ++
      Seq((5L, "t", "en", "s2")) ++ (6 to 8).map(i => (i.toLong, "t", "zh", "s2")))
      .toDF("doc_id", "text", "lang", "source")
    val g2 = graft.operators.Sampling.effectiveSampleSize(skew).collect()
      .map(r => r.getString(0) -> r).toMap
    val r = g2("s1")
    assert(r.getAs[Long]("n_docs") === 4L)
    assert(r.getAs[Double]("ess") < 4.0 && r.getAs[Double]("ess") > 1.0)
    // local recompute with the same floor quantization
    val qw23 = math.floor(16.0 / 24.0 * 1e6).toLong
    val qw2  = math.floor(2.0 * 1e6).toLong
    val s1 = 3 * qw23 + qw2
    val s2 = 3.0 * qw23 * qw23 + 1.0 * qw2 * qw2
    assert(math.abs(r.getAs[Double]("ess") - s1.toDouble * s1 / s2) < 1e-9)
  }
}
