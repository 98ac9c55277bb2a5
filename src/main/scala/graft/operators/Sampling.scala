package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset-split operators for training-
  * data pipelines. All randomness is md5-derived from a stable row
  * key, so every engine, every run, and every cluster size draws the
  * SAME sample — reproducibility is non-negotiable at 100 TB, and a
  * hash sample needs no global coordination (purely per-row, no
  * shuffle, prunes at the scan when combined with stored hash
  * columns).
  */
object Sampling {

  /** Uniform pseudo-random bucket in [0, 100) from a key column. */
  def hashPct(key: Column): Column =
    (conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 100).as("pct")

  /** Keep ~pct% of rows, deterministically. */
  def hashSample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10).cast("long") % 100 < pct)

  /** Reproducible train/validation/test split (90/5/5 by default). */
  def datasetSplit(df: DataFrame, keyCol: String, trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val pct = conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10).cast("long") % 100
    df.withColumn("split",
      when(pct < trainPct, "train")
        .when(pct < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Domain-mix resampling (the corpus-reweighting step that turns
    * raw web-scrape proportions into a target training mixture —
    * DoReMi/Pile-style source weighting): keep ~`rates(source)`% of
    * each source's documents (default `defaultPct` for unlisted
    * sources), drawn by the same md5 rule as [[hashSample]] so the
    * mixture is reproducible across engines, runs, and cluster
    * sizes. The rate table is a handful of literals compiled into
    * one CASE — purely per-row, zero shuffle, zero coordination.
    */
  def domainMix(df: DataFrame, rates: Map[String, Int], defaultPct: Int = 100,
                sourceCol: String = "source", keyCol: String = "doc_id"): DataFrame = {
    val rateCol = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (s, p)) => when(col(sourceCol) === s, lit(p)).otherwise(acc)
    }
    df.filter(
      conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10).cast("long") % 100 < rateCol)
  }

  /** Stratified sample: exactly `n` rows per stratum, chosen by the
    * deterministic hash order (rank window per stratum — one shuffle
    * on the stratum key).
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String, n: Int): DataFrame = {
    // 15 hex chars = 60 bits: 16 would overflow a signed long
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10).cast("long")
    val w = Window.partitionBy(stratumCol).orderBy(h.asc, col(keyCol).asc)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .drop("rn")
  }

  /** Token-budget sampling — the data-mixing step that caps each
    * source's contribution to a training mixture at a TOKEN budget
    * rather than a document count (sources differ wildly in mean
    * document length, so a doc-count cap skews the mixture).
    * Documents are taken in deterministic md5-hash order within
    * their source until the source's cumulative whitespace-token
    * count reaches `budgetTokens`; the document that would cross
    * the budget is dropped. The kept set is prefix-closed in the
    * hash order: a function of (corpus, budget) alone, identical on
    * every engine, run, and cluster size.
    *
    * EXACT variant: one shuffle on the source key plus a per-source
    * ordered running sum. Fine when a per-source sort fits (few
    * sources, bounded budget); at 100 TB the sort dominates — use
    * [[tokenBudgetSampleRate]], which hits the same budget in
    * expectation with zero sorting.
    */
  def tokenBudgetSample(docs: DataFrame, budgetTokens: Long,
                        sourceCol: String = "source", keyCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10).cast("long")
    val w = Window.partitionBy(sourceCol).orderBy(h.asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tok", size(split(col(textCol), " ")).cast("long"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .filter(col("cum_tok") <= budgetTokens)
      .select(col(keyCol), col(sourceCol), col("n_tok"), col("cum_tok"))
  }

  /** Rate-based token-budget sampling — the 100 TB variant of
    * [[tokenBudgetSample]]: one aggregate pass computes each
    * source's exact total token count (integer sums — engine-
    * deterministic), the keep rate `budget / total` (capped at 1)
    * becomes a per-row md5 threshold, and the sample is drawn with
    * NO per-source sort and no coordination — scan-stage per-row
    * work plus one broadcast of a tiny per-source table. The budget
    * is hit in expectation (±O(sqrt) overshoot) instead of exactly;
    * that is the correct trade at corpus scale, where a per-source
    * global sort of 100 TB is the single most expensive shuffle a
    * mixing pipeline could run.
    *
    * Hash is 32-bit (8 hex chars) so the `hash < rate * 2^32`
    * comparison is exact in doubles on every engine (every 32-bit
    * integer is representable; 60-bit hashes would round).
    */
  def tokenBudgetSampleRate(docs: DataFrame, budgetTokens: Long,
                            sourceCol: String = "source", keyCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    val withTok = docs.withColumn("n_tok", size(split(col(textCol), " ")).cast("long"))
    val totals  = withTok.groupBy(sourceCol).agg(sum(col("n_tok")).as("tot_tok"))
    val h32     = conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10).cast("long")
    withTok
      .join(broadcast(totals), sourceCol)
      .filter(h32.cast("double") <
        least(lit(budgetTokens).cast("double") / col("tot_tok").cast("double"), lit(1.0)) * lit(4294967296.0))
      .select(col(keyCol), col(sourceCol), col("n_tok"))
  }

  /** Weighted sampling without replacement — k documents drawn with
    * probability proportional to an integer weight (token count,
    * quality score bucket, ...), the Efraimidis–Spirakis reservoir
    * scheme made EXACT-integer: a unit weight draws one 60-bit
    * md5-derived hash, a weight-w row races with the MAX of w such
    * hashes (distributionally identical to the classic u^(1/w) key,
    * but every comparison is a long compare — no pow, no float, so
    * the winning set is a pure function of (corpus, k) that any
    * engine reproduces bit-for-bit).
    *
    * Scale: the race key is scan-stage per-row work costing O(weight)
    * hashes; selection is a global top-k (TakeOrderedAndProject:
    * per-partition heap of k, driver merges k·partitions rows — no
    * global sort, no shuffle of the corpus). The O(weight) hash loop
    * is clamped INTERNALLY to `maxWeight` (default 1000): a
    * 1e6-token document does not need 1e6 draws — weight resolution
    * above ~1e3 changes selection odds marginally, while an
    * unclamped weight would cost 1e6 md5s and an ~8 MB scratch array
    * per row (and overflow Spark's sequence length limit above
    * ~2.1e9). Callers who genuinely need finer odds resolution can
    * raise the cap explicitly.
    */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column, k: Int,
                     maxWeight: Int = 1000): DataFrame = {
    require(maxWeight >= 1, s"maxWeight must be >= 1, got $maxWeight")
    val w = least(greatest(weight.cast("long"), lit(1L)), lit(maxWeight.toLong)).as("w")
    val race = array_max(transform(sequence(lit(0L), col("w") - 1), j =>
      // 15 hex chars = 60 bits (16 would overflow a signed long)
      conv(substring(md5(concat(col(keyCol).cast("string"), lit(":"), j.cast("string"))), 1, 15), 16, 10)
        .cast("long"))).as("race")
    df.select(col(keyCol), w)
      .select(col(keyCol), col("w"), race)
      .orderBy(col("race").desc, col(keyCol).asc)
      .limit(k)
  }

  /** Temperature-based source mixing (the multilingual/multi-domain
    * rebalancing rule of the mC4/XLM-R family): source i's share of
    * the output mixture is proportional to n_i^alpha with alpha=1/2,
    * so small sources are up-weighted relative to their raw share
    * and head sources damped. Kept docs from source i target
    * `targetDocs * w_i / sum(w)` where w_i = floor(sqrt(n_i)); each
    * doc keeps iff its 32-bit md5 hash clears the source's rate —
    * evaluated as the cross-multiplied INTEGER comparison
    * `h32 * sumW * n_i < targetDocs * w_i * 2^32` in decimal(38,0)
    * arithmetic, so there is no float pow/sum anywhere and the kept
    * set is engine-exact. (floor(sqrt(n)) is itself exact: IEEE sqrt
    * is correctly rounded and exact on perfect squares.) Rates above
    * 1 (tiny sources asked for more than they have) saturate at
    * keep-everything — this operator cannot up-sample, so whenever
    * any source saturates the TOTAL kept falls short of targetDocs
    * and the realized mixture deviates from the n^alpha proportions.
    * The shortfall is SURFACED, not silent: every output row carries
    * `saturated` (did my source hit keep-everything?) and
    * `target_n` (the source's pre-saturation target count), so
    * `SELECT source, any(saturated), any(target_n), count(*)` is the
    * realized-vs-target audit with no second pass over the corpus.
    *
    * Scale: one count aggregate over the corpus (map-side combined),
    * a broadcast of the per-source rate table, then a scan-stage
    * per-row hash threshold — zero sorts, zero coordination, the
    * same shape as [[tokenBudgetSampleRate]].
    */
  /** [[temperatureMix]] generalized to a RATIONAL alpha = p/q (the
    * mC4/XLM-R family typically uses alpha = 0.3 = 3/10, not 1/2):
    * w_i = floor(n_i^(p/q)), computed ENGINE-EXACTLY with no float
    * pow in the result path. floor of a rational power is an integer
    * root — characterized by w^q <= n^p < (w+1)^q, all-integer
    * comparisons — so the implementation seeds a candidate from
    * float pow (correct to well within ±2 at any realistic n),
    * expands the ±2 window, and keeps the LARGEST candidate passing
    * the exact decimal(38,0) characterization. Any engine whose
    * float pow lands within 2 of the truth (IEEE pow is within 1
    * ulp) computes the identical w, so the kept set hash-matches a
    * SQL oracle exactly. Bounds: n^p and (w+2)^q must fit 38 digits
    * — p=3/q=10 holds to n ~ 2e12 docs per source.
    *
    * Keep rule, targets, and the surfaced saturation audit are
    * [[temperatureMix]]'s, with w_i swapped for the rational-alpha
    * weight; the scale shape is unchanged (one count aggregate, a
    * broadcast rate table — now ~5 rows per source during the root
    * scan — and a scan-stage hash threshold).
    */
  def temperatureMixAlpha(docs: DataFrame, targetDocs: Long, p: Int = 3, q: Int = 10,
                          sourceCol: String = "source", keyCol: String = "doc_id"): DataFrame = {
    require(p > 0 && q > p && q <= 12, s"alpha=p/q needs 0 < p < q <= 12, got $p/$q")
    val dec = "decimal(38,0)"
    def ipow(c: Column, e: Int): Column =
      (1 until e).foldLeft(c.cast(dec))((acc, _) => acc * c.cast(dec))
    val counts = docs.groupBy(sourceCol).agg(count(lit(1)).as("n_src"))
      .withColumn("w0", floor(pow(col("n_src").cast("double"), p.toDouble / q)).cast("long"))
    val w = counts
      .withColumn("cand", explode(sequence(greatest(col("w0") - 2, lit(1L)), col("w0") + 2)))
      .filter(ipow(col("cand"), q) <= ipow(col("n_src"), p))
      .groupBy(col(sourceCol), col("n_src"))
      .agg(max(col("cand")).as("w"))
    // target_n = floor(targetDocs*w / sum_w) via EXACT integer
    // arithmetic: subtract the pmod remainder first so the decimal
    // division is of an exact multiple (integer quotient, no scale-6
    // HALF_UP rounding hazard when the true quotient sits within
    // 5e-7 of an integer — matches DuckDB's HUGEINT // exactly).
    val rates = w.crossJoin(broadcast(w.agg(sum(col("w")).as("sum_w"))))
      .withColumn("tw", lit(targetDocs).cast(dec) * col("w").cast(dec))
      .withColumn("target_n",
        ((col("tw") - pmod(col("tw"), col("sum_w").cast(dec))) / col("sum_w").cast(dec))
          .cast("long"))
      .drop("tw")
      .withColumn("saturated", col("target_n") >= col("n_src"))
    val h32 = conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10).cast("long")
    docs
      .join(broadcast(rates), sourceCol)
      .filter(
        h32.cast(dec) * col("sum_w").cast(dec) * col("n_src").cast(dec) <
          lit(targetDocs).cast(dec) * col("w").cast(dec) * lit(4294967296L).cast(dec))
      .select(col(keyCol), col(sourceCol), col("n_src"), col("w"), col("target_n"), col("saturated"))
  }

  def temperatureMix(docs: DataFrame, targetDocs: Long,
                     sourceCol: String = "source", keyCol: String = "doc_id"): DataFrame = {
    val counts = docs.groupBy(sourceCol).agg(count(lit(1)).as("n_src"))
      .withColumn("w", floor(sqrt(col("n_src"))).cast("long"))
    // target_n = floor(targetDocs * w / sum_w) via EXACT integer
    // arithmetic (pmod-subtract before dividing — see
    // [[temperatureMixAlpha]] for why floor over a scale-6 decimal
    // quotient can exceed the exact floor by 1 at large sum_w);
    // saturated iff the target meets or exceeds the source.
    val decl  = "decimal(38,0)"
    val rates = counts.crossJoin(broadcast(counts.agg(sum(col("w")).as("sum_w"))))
      .withColumn("tw", lit(targetDocs).cast(decl) * col("w").cast(decl))
      .withColumn("target_n",
        ((col("tw") - pmod(col("tw"), col("sum_w").cast(decl))) / col("sum_w").cast(decl))
          .cast("long"))
      .drop("tw")
      .withColumn("saturated", col("target_n") >= col("n_src"))
    val h32   = conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10).cast("long")
    val dec   = "decimal(38,0)"
    docs
      .join(broadcast(rates), sourceCol)
      .filter(
        h32.cast(dec) * col("sum_w").cast(dec) * col("n_src").cast(dec) <
          lit(targetDocs).cast(dec) * col("w").cast(dec) * lit(4294967296L).cast(dec))
      .select(col(keyCol), col(sourceCol), col("n_src"), col("w"), col("target_n"), col("saturated"))
  }

  /** k-anonymity audit over a quasi-identifier tuple — the privacy
    * sign-off a corpus needs before release/training: every
    * (lang, source, length-bucket) equivalence class with its size,
    * an at-risk flag (class smaller than k ⇒ members re-identifiable
    * by the QI combination alone), and the class's corpus share.
    * One groupBy on the QI tuple (a single shuffle whose cardinality
    * is the bounded QI product, not the corpus); the grand total
    * rides back as a broadcast one-row aggregate; all counts exact
    * longs, the share one IEEE division, UNROUNDED.
    */
  def kAnonymity(docs: DataFrame, k: Int = 5, bucketChars: Int = 100): DataFrame = {
    val grouped = docs
      .withColumn("len_bucket", floor(col("n_chars") / bucketChars).cast("long"))
      .groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).cast("long").as("class_size"))
    val total = grouped.agg(sum(col("class_size")).as("total"))
    grouped.crossJoin(broadcast(total))
      .select(col("lang"), col("source"), col("len_bucket"), col("class_size"),
        (col("class_size") < k).as("at_risk"),
        (col("class_size").cast("double") / col("total").cast("double")).as("corpus_share"))
  }

  /** Importance-reweighting table per (source, lang): the sampling
    * weight that rebalances each feed's language mix back to the
    * CORPUS mix — w = corpus_share(lang) / source_share(source,
    * lang), the domain-rebalancing multiplier a mixture-controlled
    * training run applies per cell (w > 1: the feed under-delivers
    * that language, oversample it). Everything is exact integer
    * counts until w = (c_lang · n_source)/(n · c_cell) — cross-
    * multiplied EXACT LONG products, ONE IEEE division, UNROUNDED
    * (never a ratio of two rounded shares). Weights above `clipW`
    * flag for clipping (the variance-control step). Three bounded
    * aggregates off one scan; the lang and total tables broadcast.
    */
  def importanceWeights(docs: DataFrame, clipW: Double = 10.0): DataFrame = {
    val cell = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_cell"))
    val bySrc  = docs.groupBy(col("source")).agg(count(lit(1)).as("n_source"))
    val byLang = broadcast(docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang")))
    val total  = broadcast(docs.agg(count(lit(1)).as("n_total")))
    val w = (col("n_lang") * col("n_source")).cast("double") /
      (col("n_total") * col("n_cell")).cast("double")
    cell.join(bySrc, "source").join(byLang, "lang").crossJoin(total)
      .select(col("source"), col("lang"), col("n_cell"),
        w.as("weight"), (w > clipW).as("clipped"))
  }

  /** Effective sample size under the [[importanceWeights]]
    * reweighting, per source: ESS = (Σw)²/Σw² over the source's docs
    * — the variance cost of rebalancing (ESS ≈ n means the weights
    * are nearly uniform; ESS ≪ n means a few heavy cells dominate
    * and the rebalanced mix behaves like far fewer documents).
    * Weights quantize ONCE to micro longs (floor — mirrored
    * exactly), per-source Σn·qw is an exact long and Σn·qw² an exact
    * 128-bit decimal, and ESS is one IEEE division of splitDouble
    * images — UNROUNDED. Rides the same three bounded aggregates as
    * the weight table; nothing per-doc ever materializes.
    */
  def effectiveSampleSize(docs: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val wts = importanceWeights(docs)
      .withColumn("qw", floor(col("weight") * 1000000).cast("long"))
    val agg = wts.groupBy(col("source"))
      .agg(sum(col("n_cell")).as("n_docs"),
        sum(col("n_cell") * col("qw")).as("s1"),
        sum(col("n_cell").cast(dec) * col("qw").cast(dec) * col("qw").cast(dec)).as("s2"))
    val ess = graft.operators.Stats.splitDouble(col("s1").cast(dec) * col("s1").cast(dec)) /
      graft.operators.Stats.splitDouble(col("s2"))
    agg.select(col("source"), col("n_docs"),
      ess.as("ess"),
      (ess / col("n_docs").cast("double")).as("ess_ratio"))
  }
}
