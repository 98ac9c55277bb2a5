package graft
// (doc novelty spec appended at the end of this suite)

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  import TestSession._

  test("ngrams kernel: bit-identical to the zip_with/filter HOF chain on edge inputs") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val rnd = new scala.util.Random(11)
    val toksets: Seq[Seq[String]] = Seq(
      Seq(),                    // empty
      Seq("solo"),              // shorter than n
      Seq("a", "b"),
      Seq("a", "b", "c", "d", "e"),
      Seq("", "x", ""),         // empty tokens (split artifacts)
      (0 until 300).map(_ => ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(3))),
      Seq("café", "中文", "naïve", "ascii"))
    val df = toksets.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "toks")
    for (n <- Seq(1, 2, 3, 5)) {
      val rows = df.select(col("id"),
          TextFunctions.ngrams(col("toks"), n).as("k"),
          TextFunctions.ngramsHof(col("toks"), n).as("h"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) === r.getSeq[String](2),
          s"n=$n id=${r.getLong(0)}: kernel ${r.getSeq[String](1)} != HOF ${r.getSeq[String](2)}")
      }
    }
    // null-token windows drop in both forms (n >= 2)
    val nulls = Seq((0L, Seq[String]("a", null, "b", "c"))).toDF("id", "toks")
    val nr = nulls.select(
        TextFunctions.ngrams(col("toks"), 2).as("k"),
        TextFunctions.ngramsHof(col("toks"), 2).as("h"))
      .head()
    assert(nr.getSeq[String](0) === nr.getSeq[String](1))
  }

  test("packSequences tiles each shard's token stream exactly") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{coalesce, lit, sum}
    val docs = Tables.documents(spark, sf)
    val out  = TextAnalysis.packSequences(docs, 256, 8)
    assert(out.count() === docs.count())
    assert(out.filter($"offset_in_bin" < 0 || $"offset_in_bin" >= 256).count() === 0)
    // bin*window + offset must reconstruct the prefix token sum of
    // the shard — the layout tiles with no gaps or overlaps
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val chk = out
      .withColumn("cum", coalesce(sum("n_tokens").over(w), lit(0L)))
      .filter($"bin" * 256 + $"offset_in_bin" =!= $"cum")
    assert(chk.count() === 0)
    // default shard count scales with the cluster, not a constant
    val auto = TextAnalysis.packSequences(docs, 256)
    val wantShards = spark.sparkContext.defaultParallelism * 4
    assert(auto.count() === docs.count())
    assert(auto.filter($"shard" < 0 || $"shard" >= wantShards).count() === 0)
    // on a tiny runner (defaultParallelism <= 2) the auto default is
    // legitimately <= 8 — only assert the wider spread when the
    // derived count actually exceeds the old fixed 8
    if (wantShards > 8 && docs.count() >= wantShards)
      assert(auto.select($"shard").distinct().count() > 8,
        "auto default should spread wider than the old fixed 8 shards")
  }

  test("polarity is bounded in [-1, 1]") {
    import spark.implicits._
    val s = TextAnalysis.sentiment(Tables.documents(spark, sf))
    assert(s.filter($"polarity" < -1 || $"polarity" > 1).count() === 0)
  }

  test("chunks cover every document and respect max size") {
    import spark.implicits._
    val docs   = Tables.documents(spark, sf)
    val chunks = TextAnalysis.chunk(docs, 100, 20)
    assert(chunks.select($"doc_id").distinct().count() === docs.count())
    assert(chunks.filter(org.apache.spark.sql.functions.length($"chunk") > 100).count() === 0)
    // overlap invariant: consecutive chunks share 20 chars of text
    val c0 = chunks.filter($"doc_id" === 0).orderBy($"chunk_id").collect()
    if (c0.length > 1) {
      val first  = c0(0).getAs[String]("chunk")
      val second = c0(1).getAs[String]("chunk")
      assert(first.length < 100 || second.startsWith(first.substring(80).take(20)))
    }
  }

  test("fingerprint is deterministic and 32 hex chars") {
    import spark.implicits._
    val fp = TextAnalysis.fingerprints(Tables.documents(spark, sf))
    assert(fp.filter(!$"fp".rlike("^[0-9a-f]{32}$")).count() === 0)
  }

  test("lang_id emits only known labels") {
    import spark.implicits._
    val labels = TextAnalysis.langId(Tables.documents(spark, sf))
      .select($"lang_pred").distinct().collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("en", "es", "fr", "de", "zh", "und")))
  }

  test("perplexity score: every doc scored, xent within the unigram bounds, flag consistent") {
    import spark.implicits._
    val docs   = Tables.documents(spark, sf)
    val scored = TextAnalysis.perplexityScore(docs, 3.402)
    assert(scored.count() === docs.count())
    // mean NLL under the corpus's own unigram model is bounded by
    // [0, ln(total tokens)] — the rarest token has p >= 1/N
    val nTotal = docs.select(sum(size(split($"text", " ")))).collect()(0).getLong(0)
    val bad = scored.filter($"xent" < 0 || $"xent" > math.log(nTotal.toDouble)).count()
    assert(bad === 0)
    // flag is a pure function of the rounded score
    assert(scored.filter(($"xent" <= 3.402) =!= ($"keep" === 1)).count() === 0)
    // a doc made of the corpus's commonest tokens scores LOWER than
    // one full of rare tokens: ordering sanity on the fixture
    val range = scored.agg(min($"xent"), max($"xent")).collect()(0)
    assert(range.getDouble(0) < range.getDouble(1))
  }

  test("bigram perplexity: hand-computed tiny corpus, short-doc exclusion, fixture bounds") {
    import spark.implicits._
    // d0 "a b a b": bigrams {a b x2, b a x1}; d1 "a b c": {a b, b c};
    // pair counts: (a b)=3 (b a)=1 (b c)=1; contexts: a=3, b=2.
    // P(b|a)=1 -> term 0; P(a|b)=P(c|b)=1/2 -> term ln 2.
    // d0 xent = ln2/3 = 0.231049; d1 xent = ln2/2 = 0.346574.
    // d2 is a one-token doc: no bigram evidence, excluded.
    val tiny = Seq((0L, "a b a b"), (1L, "a b c"), (2L, "solo"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramPerplexityScore(tiny, 0.3)
      .orderBy("doc_id").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Long]("n_bg") === 3 && got(0).getAs[Double]("xent") === 0.231049)
    assert(got(1).getAs[Long]("n_bg") === 2 && got(1).getAs[Double]("xent") === 0.346574)
    assert(got(0).getAs[Int]("keep") === 1 && got(1).getAs[Int]("keep") === 0)
    // fixture: every multi-token doc scored; mean NLL under the
    // corpus's own bigram model is within [0, ln(total bigrams)]
    val docs   = Tables.documents(spark, sf)
    val scored = TextAnalysis.bigramPerplexityScore(docs)
    val multi  = docs.filter(size(split($"text", " ")) >= 2).count()
    assert(scored.count() === multi)
    val nBg = docs.select(sum(greatest(size(split($"text", " ")) - 1, lit(0))))
      .collect()(0).getLong(0)
    assert(scored.filter($"xent" < 0 || $"xent" > math.log(nBg.toDouble)).count() === 0)
    // the bigram model is strictly sharper than the unigram on the
    // same corpus: conditioning can only reduce mean NLL in
    // aggregate (H(w_i|w_{i-1}) <= H(w_i))
    val uni = TextAnalysis.perplexityScore(docs)
      .select($"doc_id", $"xent".as("uni_xent"), $"n_tok")
    val agg = scored.join(uni, "doc_id")
      .agg(sum($"xent" * $"n_bg"), sum($"uni_xent" * $"n_tok")).collect()(0)
    assert(agg.getDouble(0) / agg.getDouble(1) < 1.0)
  }

  test("bm25: hand-checkable ranking, bounded k, deterministic") {
    import spark.implicits._
    // doc 1 matches both query terms, doc 2 one, doc 3 none; the
    // rare term ("rust") outweighs the common one by idf
    val docs = Seq(
      (1L, "rust compiler rust borrow"),
      (2L, "java compiler warnings galore"),
      (3L, "coffee and tea"),
      (4L, "compiler compiler compiler compiler")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, Seq((1L, "rust compiler")), k = 3)
      .orderBy($"rnk").collect()
    assert(got.length === 3)
    assert(got(0).getAs[Long]("doc_id") === 1L, s"rust doc must rank first: ${got.mkString(",")}")
    // no doc without a query term is ever scored
    assert(!got.map(_.getAs[Long]("doc_id")).contains(3L))
    // fixture run: exactly k rows per query, deterministic re-run
    val fx = Tables.documents(spark, sf)
    val qs = Seq((1L, "gain up good value"), (2L, "slow error bad join"))
    val a  = TextAnalysis.bm25TopK(fx, qs, k = 5)
    assert(a.groupBy($"query_id").count().collect().forall(_.getLong(1) === 5L))
    assert(a.exceptAll(TextAnalysis.bm25TopK(fx, qs, k = 5)).count() === 0)
    // scores are positive (Lucene idf form) and ranks within k
    assert(a.filter($"score" <= 0 || $"rnk" > 5).count() === 0)
  }

  test("pmi collocations match the local count-based formula") {
    import TestSession.spark.implicits._
    val texts = Seq("x y x y x y", "x y z w", "z w z w z w", "q r q r")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(df, minCount = 2, k = 10).collect()
    // local reference: adjacent-pair and token counts over the corpus
    val toks = texts.map(_.split(" ", -1).toSeq)
    val uni  = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi   = toks.flatMap(ts => ts.sliding(2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nu = uni.values.sum.toDouble
    val nb = bi.values.sum.toDouble
    def pmi(bg: String): Double = {
      val Array(x, y) = bg.split(" ")
      math.log(bi(bg)) + 2.0 * math.log(nu) - math.log(nb) -
        math.log(uni(x).toDouble) - math.log(uni(y).toDouble)
    }
    val want = bi.filter(_._2 >= 2).keys.toSeq
      .map(bg => (bg, bi(bg), BigDecimal(pmi(bg)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy { case (bg, _, p) => (-p, bg) }
    assert(got.length === want.length)
    got.zip(want).foreach { case (r, (bg, n, p)) =>
      assert(r.getAs[String]("bigram") === bg)
      assert(r.getAs[Long]("n") === n)
      assert(math.abs(r.getAs[Double]("pmi") - p) < 1e-6, s"$bg pmi")
    }
    // the hapax guard: dropping the floor admits count-1 bigrams
    assert(TextAnalysis.pmiCollocations(df, minCount = 1, k = 100).count() > got.length)
  }

  test("vocab coverage matches local Zipf-head computation, shares monotone to <= 1") {
    import TestSession.spark.implicits._
    val df = Seq((0L, "a a a b b c"), (1L, "a b c d")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(df, 3).orderBy($"rnk").collect()
    // counts: a=4, b=3, c=2, d=1; total=10
    val want = Seq(("a", 4L, 0.4), ("b", 3L, 0.7), ("c", 2L, 0.9))
    assert(got.length === 3)
    got.zip(want).zipWithIndex.foreach { case ((r, (tok, cnt, share)), i) =>
      assert(r.getAs[Long]("rnk") === i + 1L)
      assert(r.getAs[String]("tok") === tok)
      assert(r.getAs[Long]("cnt") === cnt)
      assert(math.abs(r.getAs[Double]("cum_share") - share) < 1e-9)
    }
    // fixture: shares non-decreasing, counts non-increasing, last <= 1
    val fx = TextAnalysis.vocabCoverage(Tables.documents(spark, sf), 20).orderBy($"rnk").collect()
    fx.sliding(2).foreach { p =>
      if (p.length == 2) {
        assert(p(0).getAs[Long]("cnt") >= p(1).getAs[Long]("cnt"))
        assert(p(0).getAs[Double]("cum_share") <= p(1).getAs[Double]("cum_share"))
      }
    }
    assert(fx.last.getAs[Double]("cum_share") <= 1.0)
  }

  test("cluster top terms: idf semantics, rank shape, and the one-cell degenerate") {
    import TestSession.spark.implicits._
    val docs = Tables.documents(spark, sf)
    val got  = TextAnalysis.clusterTopTerms(docs, nlist = 8, dim = 16, k = 3)
    // ranks contiguous from 1, at most k per cell, scores
    // non-increasing in rank and never negative (df <= nCells)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"cell").orderBy($"rnk")
    val shaped = got
      .withColumn("expect_rn", row_number().over(w).cast("long"))
      .withColumn("prev_score", lag($"score", 1).over(w))
    assert(shaped.filter($"rnk" =!= $"expect_rn" || $"rnk" > 3).count() === 0)
    assert(shaped.filter($"prev_score".isNotNull && $"score" > $"prev_score").count() === 0)
    assert(got.filter($"score" < 0).count() === 0)
    // one cell: every term's idf is ln(1) = 0 — all scores zero
    val one = TextAnalysis.clusterTopTerms(docs, nlist = 1, dim = 16, k = 3)
    assert(one.count() === 3)
    assert(one.filter($"score" =!= 0.0).count() === 0)
    // determinism
    assert(got.exceptAll(TextAnalysis.clusterTopTerms(docs, 8, 16, 3)).count() === 0)
  }

  test("char ngrams: hand-counted grams, short docs skipped, conservation") {
    import TestSession.spark
    import spark.implicits._
    val docs = Seq((1L, "AAAB"), (2L, "ab"), (3L, "aab")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.charNgrams(docs, 3, 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // "aaab" -> aaa, aab; "ab" too short; "aab" -> aab
    assert(got === Map("aaa" -> 1L, "aab" -> 2L))
    // fixture: total grams = sum over docs of (len - 2), capped list respects k
    val fx = Tables.documents(spark, TestSession.sf)
    val want = fx.filter(length($"text") >= 3)
      .agg(sum(length($"text") - 2)).head().getLong(0)
    val total = graft.operators.TextAnalysis.charNgrams(fx, 3, 1000000)
      .agg(sum($"n_grams")).head().getLong(0)
    assert(total === want)
  }

  test("zipf slope is exactly -1 with r2 1 on an exact-harmonic vocabulary") {
    import TestSession.spark
    import spark.implicits._
    // counts 12, 6, 4, 3 = 12/rank exactly, all distinct so ranks
    // are deterministic: ln(cnt) = ln 12 - ln(rank) -> slope -1, r2 1
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++ Seq.fill(4)("c") ++ Seq.fill(3)("d"))
      .mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = TextAnalysis.zipfSlope(docs, 100).head()
    assert(got.getAs[Long]("k_types") === 4L)
    assert(math.abs(got.getAs[Double]("slope") - -1.0) < 1e-6)
    assert(math.abs(got.getAs[Double]("r2") - 1.0) < 1e-6)
    assert(math.abs(got.getAs[Double]("intercept") - math.log(12.0)) < 1e-5)
  }

  test("vocab shift: injected second-half token tops the movers; symmetric swap negates shift") {
    import spark.implicits._
    // halves share a stable background vocabulary; "neologism" exists
    // only in the second half, "archaic" only in the first
    val base = "the quick brown fox jumps over the lazy dog"
    val docs = ((0 until 10).map(i => (i.toLong, s"$base archaic")) ++
      (10 until 20).map(i => (i.toLong, s"$base neologism")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabShift(docs, k = 5, minCount = 5).collect()
    val byTok = got.map(r => r.getString(0) -> r.getAs[Double]("shift")).toMap
    assert(byTok.contains("neologism") && byTok("neologism") > 0, s"new token must shift up: $byTok")
    assert(byTok.contains("archaic") && byTok("archaic") < 0, s"dropped token must shift down: $byTok")
    // the injected tokens move more than any background token
    val background = got.filter(r => !Set("neologism", "archaic").contains(r.getString(0)))
    background.foreach { r =>
      assert(r.getAs[Double]("abs_shift") <= math.abs(byTok("neologism")) + 1e-9)
    }
    // counts: 10 each on their own side, 0 on the other
    val neo = got.find(_.getString(0) == "neologism").get
    assert(neo.getAs[Long]("cnt_a") === 0L && neo.getAs[Long]("cnt_b") === 10L)
  }

  test("lexical diversity: hand counts; repeated boilerplate scores low TTR") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),            // all hapax: ttr 1, hapax 1
      (2L, "a a a a b b"),        // 2 types / 6 tokens, 0 hapax
      (3L, "x y x z"))            // 3 types / 4 tokens, hapax y,z -> 2/3
      .toDF("doc_id", "text")
    val got = TextAnalysis.lexicalDiversity(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq === Seq(
      (1L, 4L, 4L, 4L, 1.0, 1.0),
      (2L, 6L, 2L, 0L, 0.333333, 0.0),
      (3L, 4L, 3L, 2L, 0.75, 0.666667)))
  }

  test("char composition: hand-built shares; anomalies flag planted control chars and runs") {
    import spark.implicits._
    // "Ab1! " = 5 chars: 1 upper, 1 digit, 1 punct, 1 space
    val docs = Seq((1L, "Ab1! ", "A"), (2L, "abcd", "A")).toDF("doc_id", "text", "source")
    val r = TextAnalysis.charComposition(docs).head()
    assert(r.getAs[Long]("n_docs") === 2L)
    assert(r.getAs[Double]("upper_share") === 0.1)   // (0.2 + 0)/2
    assert(r.getAs[Double]("digit_share") === 0.1)
    assert(r.getAs[Double]("punct_share") === 0.1)
    assert(r.getAs[Double]("space_share") === 0.1)
    val bad = Seq(
      (1L, "clean prose here"),
      (2L, "null\u0000byte"),
      (3L, "moji�bake"),
      (4L, "x" * 250))
      .toDF("doc_id", "text")
    val flags = TextAnalysis.encodingAnomalies(bad).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(flags.toSeq === Seq(
      (1L, 0, 0, 0), (2L, 1, 0, 0), (3L, 0, 1, 0), (4L, 0, 0, 1)))
  }

  test("readability: hand-counted flesch, fragment floors at one sentence, empty doc excluded") {
    import spark.implicits._
    val docs = Seq(
      // 6 words, 2 sentences, syllable groups: the(1) cat(1) sat(1) here(2: e,e... 'here' -> h-e-r-e: groups 'e','e' = 2) it(1) is(1)
      (1L, "The cat sat here. It is."),
      (2L, "word"),              // fragment: 1 word, floor 1 sentence, 1 syllable group
      (3L, ""),                  // no words: excluded
      (4L, "   "))               // whitespace only: excluded
      .toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs).orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    val r1 = got(0)
    assert(r1.getAs[Long]("n_words") === 6L)
    assert(r1.getAs[Long]("n_sentences") === 2L)
    assert(r1.getAs[Long]("n_syllables") === 7L)
    val want = 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (7.0 / 6.0)
    assert(math.abs(r1.getAs[Double]("flesch") - want) < 1e-6)
    val r2 = got(1)
    assert(r2.getAs[Long]("n_sentences") === 1L)
    assert(r2.getAs[Long]("n_syllables") === 1L)
    // fixture: every scored doc lands in a band, counts positive
    val fx = TextAnalysis.readability(Tables.documents(spark, sf))
    assert(fx.count() > 0)
    assert(fx.filter(col("band").isNull || col("n_words") <= 0).count() === 0)
  }

  test("doc novelty: shared-vocabulary docs read 0, the rare-vocabulary doc reads highest") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common words everywhere"),
      (2L, "common words everywhere"),
      (3L, "common words everywhere"),
      (4L, "utterly singular vocabulary here")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.docNovelty(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("novelty")).toMap
    // docs 1-3 share every token (df=3 of 4): idf = ln(4/3) each
    val idf3 = math.floor(math.log(4.0 / 3) * 1e6) / 1e6
    (1L to 3L).foreach(d => assert(math.abs(got(d) - idf3) < 1e-9, s"doc $d"))
    // doc 4's tokens are unique (df=1): idf = ln 4 — strictly the most novel
    val idf1 = math.floor(math.log(4.0) * 1e6) / 1e6
    assert(math.abs(got(4L) - idf1) < 1e-9)
    assert(got(4L) > got(1L))
  }

  test("lang mix: per-source predicted shares are exact") {
    import spark.implicits._
    val en = "the cat and the dog of the house"
    val fr = "le chat et les chiens des maisons"
    val docs = Seq(
      (1L, en, "en", "w"), (2L, en, "en", "w"), (3L, fr, "fr", "w"),
      (4L, fr, "fr", "x")
    ).toDF("doc_id", "text", "lang", "source")
    val got = graft.operators.TextAnalysis.langMix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got(("w", "en")).getAs[Long]("n_docs") === 2L)
    assert(math.abs(got(("w", "en")).getAs[Double]("share_of_source") - 2.0 / 3.0) < 1e-15)
    assert(got(("w", "fr")).getAs[Long]("n_docs") === 1L)
    assert(got(("x", "fr")).getAs[Double]("share_of_source") === 1.0)
  }

  test("lang confusion: correct and confused cells land with exact counts and shares") {
    import spark.implicits._
    val en = "the cat and the dog of the house"
    val fr = "le chat et les chiens des maisons"
    val docs = Seq(
      (1L, en, "en", "w"), (2L, en, "en", "w"),   // correctly english
      (3L, en, "fr", "w"),                        // labeled fr, reads en
      (4L, fr, "fr", "w")                         // correctly french
    ).toDF("doc_id", "text", "lang", "source")
    val got = graft.operators.TextAnalysis.langConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got(("en", "en")).getAs[Long]("n_docs") === 2L)
    assert(got(("en", "en")).getAs[Boolean]("correct"))
    assert(got(("en", "en")).getAs[Double]("share_of_lang") === 1.0)
    assert(got(("fr", "en")).getAs[Long]("n_docs") === 1L)
    assert(!got(("fr", "en")).getAs[Boolean]("correct"))
    assert(got(("fr", "en")).getAs[Double]("share_of_lang") === 0.5)
    assert(got(("fr", "fr")).getAs[Double]("share_of_lang") === 0.5)
  }

  test("template prefixes: shared openings surface with exact counts, unique ones don't") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cookie notice please accept our terms", "w"),
      (2L, "cookie notice please read this", "w"),
      (3L, "cookie notice please go away", "w"),
      (4L, "a unique opening entirely", "w"),
      (5L, "hello world again and again", "x"),
      (6L, "hello world once more", "x")
    ).toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
    val got = graft.operators.TextAnalysis.templatePrefixes(docs, 3, 5).collect()
      .map(r => (r.getString(0), r.getAs[String]("prefix")) -> r).toMap
    assert(got(("w", "cookie notice please")).getAs[Long]("n_docs") === 3L)
    assert(got(("w", "cookie notice please")).getAs[Double]("share_of_source") === 0.75)
    assert(got.keys.count(_._1 == "w") === 1, "the unique opening must not surface")
    // the x prefixes differ at token 3 -> no >=2 cluster at nTok=3
    assert(!got.keys.exists(_._1 == "x"))
    // at nTok=2 the x docs share "hello world"
    val two = graft.operators.TextAnalysis.templatePrefixes(docs, 2, 5).collect()
      .map(r => (r.getString(0), r.getAs[String]("prefix")) -> r.getAs[Long]("n_docs")).toMap
    assert(two(("x", "hello world")) === 2L)
  }

  test("code detect: symbol-dense text flags code-like, prose does not, counts exact") {
    import spark.implicits._
    val code  = "def f(x) { return x[0] + g(y); } # inline <T> = 42;"
    val prose = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq((1L, code, "en", "gh"), (2L, prose, "en", "web"),
      (3L, prose, "en", "gh")).toDF("doc_id", "text", "lang", "source")
    val got = graft.operators.TextAnalysis.codeDetect(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val gh = got("gh")
    assert(gh.getAs[Long]("n_docs") === 2L && gh.getAs[Long]("n_code_like") === 1L)
    val expectedSyms = code.count("{}[]();=<>#".contains(_)).toLong
    assert(gh.getAs[Long]("sym_chars") === expectedSyms + 0L)
    assert(gh.getAs[Double]("code_share") === 0.5)
    val web = got("web")
    assert(web.getAs[Long]("n_code_like") === 0L && web.getAs[Double]("code_share") === 0.0)
  }

  test("heaps law: vocabulary counts once at its first doc's band; all counts cumulative and exact") {
    import spark.implicits._
    // ids 0..9, 2 checkpoints: ceil(2*id/9) puts ids 0-4 in band 1, 5-9 in band 2;
    // token c first appears at doc 5 -> vocab grows 2 -> 3
    val docs = (0L until 10L).map(i => (i, if (i < 5) "a b" else "a c"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.heapsLaw(docs, 2).orderBy("cp").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Long]("n_docs") === 5L && got(1).getAs[Long]("n_docs") === 10L)
    assert(got(0).getAs[Long]("n_tokens") === 10L && got(1).getAs[Long]("n_tokens") === 20L)
    assert(got(0).getAs[Long]("vocab") === 2L && got(1).getAs[Long]("vocab") === 3L)
  }

  test("js divergence: a source matching the corpus mix reads exactly 0; disjoint halves match hand JS") {
    import spark.implicits._
    val same = Seq((1L, "a b", "s1"), (2L, "a b", "s2"))
      .toDF("doc_id", "text", "source")
    val got0 = graft.operators.TextAnalysis.jsDivergence(same).collect()
    assert(got0.length === 2)
    assert(got0.forall(_.getAs[Double]("js_nats") === 0.0),
      "p == q collapses every term and the absent tail to zero")
    // disjoint equal halves: corpus q = 1/2 for both tokens
    val disj = Seq((1L, "a a a a", "s1"), (2L, "b b b b", "s2"))
      .toDF("doc_id", "text", "source")
    val got1 = graft.operators.TextAnalysis.jsDivergence(disj).collect()
    val term = 1.0 * math.log(1.0) + 0.5 * math.log(0.5) - 1.5 * math.log(1.5 / 2)
    val js   = (math.floor(term * 1e12) / 1e12 + math.log(2.0) * (1.0 - 0.5)) / 2
    val want = BigDecimal(js).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got1.forall(_.getAs[Double]("js_nats") === want), s"want $want, got ${got1.toSeq}")
  }

  test("token gini: uniform counts read exactly 0; the 1,1,1,97 hand case reads exactly 0.72") {
    import spark.implicits._
    val uniform = Seq((1L, "a b c d", "u")).toDF("doc_id", "text", "source")
    val skew = Seq((2L, ("d " * 97).trim + " a b c", "s")).toDF("doc_id", "text", "source")
    val got = graft.operators.TextAnalysis.tokenGini(uniform.union(skew)).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("u").getAs[Double]("token_gini") === 0.0)
    assert(got("u").getAs[Long]("vocab") === 4L && got("u").getAs[Long]("n_tokens") === 4L)
    // ranks (1,2,3,4) on counts (1,1,1,97): G = 2*394/(4*100) - 5/4 = 0.72
    assert(got("s").getAs[Double]("token_gini") === 0.72)
  }
}
