package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ParseFunctions
import graft.operators.{Dedup, Embedding}

/** Randomized (seeded, deterministic) exactness checks over
  * generated corpora — the structured complement to the fixed-corpus
  * specs: mutation-heavy documents stress the PPJoin prefix bound at
  * and around the threshold boundary, and generated numbers stress
  * the parsers' round-trip.
  */
class PropertySpec extends AnyFunSuite {
  import TestSession._

  private val rnd   = new scala.util.Random(20260812L)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi")

  /** Corpus of base docs + near-duplicate mutations (token swaps at
    * varying rates), engineered to produce pairs straddling J = 0.8.
    */
  private def mutatedCorpus(nBase: Int, mutsPerBase: Int): Seq[(Long, String)] = {
    var id = -1L
    (0 until nBase).flatMap { _ =>
      val base = Vector.fill(12 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
      val docs = base +: Vector.fill(mutsPerBase) {
        base.map(t => if (rnd.nextDouble() < 0.08) vocab(rnd.nextInt(vocab.size)) else t)
      }
      docs.map { toks => id += 1; (id, toks.mkString(" ")) }
    }
  }

  test("zip_with ngrams equal the transform(sequence) formulation on random docs, n=2..4") {
    import spark.implicits._
    // include degenerate docs shorter than n
    val texts = Seq("", "solo", "two words") ++
      (0 until 40).map(_ => Vector.fill(1 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val toks = split(lower(col("text")), " ")
    for (n <- 2 to 4) {
      val naiveStarts = when(size(toks) - (n - 1) >= 1, sequence(lit(1), size(toks) - (n - 1))).otherwise(array())
      val naive = docs.select(col("doc_id"),
        transform(naiveStarts, i => concat_ws(" ", slice(toks, i, lit(n)))).as("g"))
      val fast  = docs.select(col("doc_id"), graft.functions.TextFunctions.ngrams(toks, n).as("g"))
      val diff = naive.join(fast.withColumnRenamed("g", "g2"), "doc_id")
        .filter(not(col("g") <=> col("g2"))).count()
      assert(diff === 0, s"ngrams(n=$n) diverges from the naive formulation")
    }
  }

  test("ppjoin equals the naive join on a mutation-heavy random corpus, at two thresholds") {
    import spark.implicits._
    val docs = mutatedCorpus(25, 3).toDF("doc_id", "text").repartition(8)
    for (t <- Seq(0.6, 0.8)) {
      val sh = Dedup.shingles(docs, 3)
      val sz = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      val naive = sh.as("a")
        .join(sh.as("b"), $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id".as("da"), $"b.doc_id".as("db"))
        .agg(count(lit(1)).as("i"))
        .join(sz.select($"doc_id".as("da"), $"n".as("na")), "da")
        .join(sz.select($"doc_id".as("db"), $"n".as("nb")), "db")
        .select($"da", $"db", ($"i".cast("double") / ($"na" + $"nb" - $"i")).as("jaccard"))
        .filter($"jaccard" >= t)
      val fast = Dedup.ngramJaccardPairs(docs, 3, t)
      assert(naive.count() > 0, s"threshold $t produced no ground-truth pairs")
      assert(fast.exceptAll(naive).count() === 0 && naive.exceptAll(fast).count() === 0,
        s"ppjoin != naive at threshold $t")
    }
  }

  test("ppjoin keeps exact-boundary pairs (J == t with t*n_sh integral)") {
    import spark.implicits._
    // both docs: 14 tokens -> 12 distinct shingles; 8 shared =>
    // J = 8/16 = 0.5 and t*n_sh = 0.5*12 = 6 is mathematically
    // integral — the fp-ceil boundary the epsilon guard exists for
    val base = Vector.tabulate(14)(i => vocab(i % vocab.size) + i)
    val docA = base.mkString(" ")
    val docB = (base.take(10) ++ Vector("zz1", "zz2", "zz3", "zz4")).mkString(" ")
    val docs = Seq((0L, docA), (1L, docB)).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, 3)
    val inter = sh.filter($"doc_id" === 0).select($"s")
      .intersect(sh.filter($"doc_id" === 1).select($"s")).count().toDouble
    assert(inter === 8.0, s"corpus construction drifted: inter=$inter")
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.5) // threshold == exact J
    assert(pairs.count() === 1, "boundary pair J=t=0.5 dropped")
  }

  test("banded hamming join equals the all-pairs sweep on a mutation-heavy random corpus") {
    import spark.implicits._
    val docs = mutatedCorpus(20, 4).toDF("doc_id", "text").repartition(8)
    val naive = Dedup.simhashPairs(Dedup.simhash(docs), 4)
      .select($"da", $"db", $"dist".cast("long").as("dist"))
    val banded = Dedup.simhashNearDupPairs(docs, 4)
    assert(naive.count() > 0, "mutated corpus produced no dist<=4 pairs")
    assert(banded.exceptAll(naive).count() === 0 && naive.exceptAll(banded).count() === 0)
  }

  test("wide simhash on random corpora: token-order invariant, banding equals all-pairs sweep") {
    import spark.implicits._
    val docs = mutatedCorpus(20, 4).toDF("doc_id", "text").repartition(8)
    // SimHash is a fold over the token MULTISET: shuffling tokens
    // must leave both lanes bit-identical (the property banding and
    // chunked ingestion both lean on)
    val shuffled = docs.select($"doc_id",
      concat_ws(" ", shuffle(split(lower($"text"), " "), lit(7L))).as("text"))
    val a = Dedup.simhashWide(docs)
    val b = Dedup.simhashWide(shuffled)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0,
      "wide simhash is not token-order invariant")
    // 120-bit banding is exact on random corpora too, not just the
    // fixture: identical to the quadratic sweep over both lanes
    val wide = a
    val naive = wide.as("x").join(wide.as("y"), $"x.doc_id" < $"y.doc_id")
      .withColumn("dist",
        (bit_count($"x.sh_lo".bitwiseXOR($"y.sh_lo")) +
          bit_count($"x.sh_hi".bitwiseXOR($"y.sh_hi"))).cast("long"))
      .filter($"dist" <= 4)
      .select($"x.doc_id".as("da"), $"y.doc_id".as("db"), $"dist")
    val banded = Dedup.simhashNearDupPairsWide(docs, 4, 6)
    assert(naive.count() > 0, "mutated corpus produced no wide dist<=4 pairs")
    assert(banded.exceptAll(naive).count() === 0 && naive.exceptAll(banded).count() === 0)
  }

  test("bloom on random corpora: zero false negatives at three sizes, probe matches a local bloom") {
    import spark.implicits._
    // random member/non-member string universes; the salted suffix
    // guarantees disjointness
    val members = (0 until 400).map(i => s"m-${rnd.nextLong()}-$i")
    val nons    = (0 until 400).map(i => s"n-${rnd.nextLong()}-$i-absent")
    for (m <- Seq(1 << 10, 1 << 13, 1 << 16)) {
      val df   = members.toDF("s")
      val bits = Dedup.bloomBitset(df, "s", m, 5)
      val fn   = df.filter(!Dedup.bloomProbe(col("s"), bits, 5)).count()
      assert(fn === 0, s"false negatives at m=$m — impossible for a correct bloom")
      // smaller m -> more false positives, never any false negative
      val fpr = nons.toDF("s").filter(Dedup.bloomProbe(col("s"), bits, 5)).count().toDouble / nons.size
      assert(fpr <= 1.0) // sanity; the tight bound is fixture-spec'd at m=2^16
    }
  }

  test("token budget sampling: budget sweep is monotone and prefix-closed on a random corpus") {
    import spark.implicits._
    val docs = mutatedCorpus(30, 2).map { case (id, t) => (id, t, s"src${id % 5}") }
      .toDF("doc_id", "text", "source")
    val budgets = Seq(50L, 200L, 800L)
    val kept = budgets.map(b =>
      graft.operators.Sampling.tokenBudgetSample(docs, b)
        .select("doc_id").as[Long].collect().toSet)
    // monotone: larger budget keeps a superset
    assert(kept(0).subsetOf(kept(1)) && kept(1).subsetOf(kept(2)),
      "token budget kept-sets must be nested as the budget grows")
    // rate variant keeps everything when the budget covers the corpus
    val all = graft.operators.Sampling.tokenBudgetSampleRate(docs, 1000000)
    assert(all.count() === docs.count())
  }

  test("parsers round-trip generated values and reject generated garbage") {
    import spark.implicits._
    val pcts = (1 to 200).map { _ =>
      val v = math.round(rnd.nextDouble() * 20000 - 10000) / 100.0
      (s"$v%", v)
    }
    val got = pcts.toDF("s", "want")
      .select(ParseFunctions.parsePercent($"s").as("got"), $"want")
      .filter($"got" =!= $"want" || $"got".isNull)
    assert(got.count() === 0)
    val curs = (1 to 200).map { _ =>
      val base = math.round(rnd.nextDouble() * 99900 + 100) / 100.0
      val (suf, mult) = Seq(("", 1.0), ("K", 1e3), ("M", 1e6), ("B", 1e9))(rnd.nextInt(4))
      (s"$$$base$suf", base * mult)
    }
    val gotC = curs.toDF("s", "want")
      .select(ParseFunctions.parseCurrency($"s").as("got"), $"want")
      .filter($"got" =!= $"want" || $"got".isNull)
    assert(gotC.count() === 0)
    val junk = Seq("", "%", "$", "abc", "1.2.3%", "$1B2", "12%%", "--5%", "$-1Q").toDF("s")
    assert(junk.select(ParseFunctions.parsePercent($"s").as("p")).filter($"p".isNotNull).count() === 0)
    assert(junk.select(ParseFunctions.parseCurrency($"s").as("c")).filter($"c".isNotNull).count() === 0)
  }

  test("driver-side embedding twin agrees with the codegen'd expression on random texts") {
    import spark.implicits._
    val texts = (0 until 100).map { i =>
      (i.toLong, Vector.fill(1 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dist = Embedding.embedChunks(
      texts.toDF("doc_id", "chunk").withColumn("chunk_id", lit(0L)))
      .select($"doc_id", $"v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    texts.foreach { case (id, s) =>
      assert(dist(id) === Embedding.featureHashVecLocal(s, 16).toSeq, s"mismatch on doc $id")
    }
  }
}
