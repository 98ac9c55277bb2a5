package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.plans.GraftHashOps

/** BPE tokenizer-apply: the greedy merge fold against the in-repo
  * table, checked against HAND-DERIVED tokenizations of the corpus
  * vocabulary (worked out independently on paper from the merge
  * list), plus the census expression and the packing twin.
  */
class BpeSpec extends AnyFunSuite {
  import TestSession._

  // every corpus word's expected tokenization, derived by hand by
  // walking the merge list in order (one greedy left-to-right pass
  // per merge) — an independent re-derivation of the fold
  private val expected = Map(
    "join"     -> Seq("join"),
    "hash"     -> Seq("hash"),
    "row"      -> Seq("row"),
    "batch"    -> Seq("batch"),
    "scan"     -> Seq("scan"),
    "customer" -> Seq("cu", "sto", "mer"),
    "column"   -> Seq("column"),
    "filter"   -> Seq("filter"),
    "small"    -> Seq("smal", "l"),
    "slow"     -> Seq("slo", "w"),
    "merge"    -> Seq("mer", "g", "e"),
    "order"    -> Seq("ord", "er"),
    "vector"   -> Seq("ve", "c", "t", "or"),
    "line"     -> Seq("line"),
    "data"     -> Seq("data"),
    "table"    -> Seq("ta", "b", "le"),
    "agg"      -> Seq("agg"),
    "value"    -> Seq("value"),
    "key"      -> Seq("key"),
    "stream"   -> Seq("stre", "a", "m"),
    "window"   -> Seq("window"),
    "spark"    -> Seq("spark"),
    "a"        -> Seq("a"),
    "group"    -> Seq("group"),
    "part"     -> Seq("part"),
    "big"      -> Seq("big"),
    "sort"     -> Seq("sort"),
    "query"    -> Seq("query"),
    "fast"     -> Seq("fast"),
    "the"      -> Seq("the"),
    "dup"      -> Seq("dup"))

  test("bpeTokenizeWord matches the hand-derived tokenization of every corpus word") {
    expected.foreach { case (w, toks) =>
      assert(GraftHashOps.bpeTokenizeWord(w).toSeq === toks, s"word '$w'")
    }
  }

  test("greedy single-pass semantics: a fresh merge does not immediately re-merge") {
    // (a,g) on a,g,g: the first merge makes 'ag', whose last symbol
    // is no longer 'a', so the second g survives for the (ag,g) pass
    assert(GraftHashOps.bpeTokenizeWord("agg").toSeq === Seq("agg"))
    // unknown word: partial merges only, singles survive
    assert(GraftHashOps.bpeTokenizeWord("zzz").toSeq === Seq("z", "z", "z"))
    assert(GraftHashOps.bpeTokenizeWord("x").toSeq === Seq("x"))
  }

  test("every multi-char token is a merge output; OOV = rare surviving singles") {
    val outputs = GraftHashOps.BpeMerges.map { case (a, b) => a + b }.toSet
    val singles = GraftHashOps.BpeBaseSingles.map(_.toString).toSet
    expected.values.flatten.foreach { t =>
      if (t.length > 1) assert(outputs.contains(t), s"multi-char token '$t' must be a merge output")
      else assert(("abcdefghijklmnopqrstuvwxyz" contains t), s"'$t'")
    }
    // the census's OOV definition: not a merge output, not a base single
    val oov = expected.values.flatten.filterNot(t => outputs.contains(t) || singles.contains(t)).toSet
    assert(oov === Set("w", "g", "c", "b", "m"))
  }

  test("bpeEncodeStats census agrees with a per-word recomputation on the fixture") {
    val docs = Tables.documents(spark, sf)
    val out  = TextAnalysis.bpeEncodeStats(docs).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // independent recomputation: collect texts, tokenize word-lists
    // through the same public per-word function (the expression adds
    // only the scanning + memo layers this asserts against)
    val outputs = GraftHashOps.BpeMerges.map { case (a, b) => a + b }.toSet
    val singles = GraftHashOps.BpeBaseSingles.map(_.toString).toSet
    val rows = docs.select("source", "text").collect()
    val want = rows.groupBy(_.getString(0)).map { case (src, rs) =>
      var nw, nt, no = 0L
      rs.foreach { r =>
        "[a-z]+".r.findAllIn(r.getString(1).toLowerCase(java.util.Locale.ROOT)).foreach { w =>
          val toks = GraftHashOps.bpeTokenizeWord(w)
          nw += 1; nt += toks.length
          no += toks.count(t => !outputs.contains(t) && !singles.contains(t))
        }
      }
      src -> (rs.length.toLong, nw, nt, no)
    }
    assert(out === want)
  }

  test("packSequencesBpe tiles each shard's BPE-token stream exactly") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
    val out  = TextAnalysis.packSequencesBpe(docs, 256, 8)
    assert(out.count() === docs.count())
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val chk = out
      .withColumn("cum", coalesce(sum("n_tokens").over(w), lit(0L)))
      .filter(col("bin") * 256 + col("offset_in_bin") =!= col("cum"))
    assert(chk.count() === 0)
    // the BPE cost differs from the whitespace twin (real tokens,
    // not words): at least one document must pack differently
    val ws = TextAnalysis.packSequences(docs, 256, 8)
      .select(col("doc_id"), col("n_tokens").as("ws_tokens"))
    val diff = out.join(ws, "doc_id").filter(col("n_tokens") =!= col("ws_tokens"))
    assert(diff.count() > 0)
  }

  test("bpeTrainStep: hand-derived pair census on a tiny corpus") {
    import spark.implicits._
    // the: [the] (no pair); vector: [ve,c,t,or] x2; merge: [mer,g,e] x3
    val docs = Seq("the vector merge", "vector merge merge").toDF("text")
    val got = TextAnalysis.bpeTrainStep(docs, 20).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(
      ("g", "e", 3L, 1L), ("mer", "g", 3L, 1L),
      ("c", "t", 2L, 1L), ("t", "or", 2L, 1L), ("ve", "c", 2L, 1L)))
  }

  test("bpeTrainStep counts a pair repeated WITHIN one word per occurrence") {
    import spark.implicits._
    // ananana -> [an, an, an, a]: (an,an) twice per occurrence
    val docs = Seq("ananana", "ananana x").toDF("text")
    val got = TextAnalysis.bpeTrainStep(docs, 20).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(("an", "an", 4L, 1L), ("an", "a", 2L, 1L)))
  }

  test("bpeTrainStep top-20 agrees with an independent per-word recomputation on the fixture") {
    val docs = Tables.documents(spark, sf)
    val got = TextAnalysis.bpeTrainStep(docs, 20).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    // independent counting path: word frequencies + pair multiset in
    // plain Scala over the same public per-word tokenizer
    val freq = scala.collection.mutable.HashMap.empty[String, Long]
    docs.select("text").collect().foreach { r =>
      "[a-z]+".r.findAllIn(r.getString(0).toLowerCase(java.util.Locale.ROOT))
        .foreach(w => freq(w) = freq.getOrElse(w, 0L) + 1L)
    }
    val cnt   = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val nDist = scala.collection.mutable.HashMap.empty[(String, String), Set[String]]
    freq.foreach { case (w, f) =>
      val toks = GraftHashOps.bpeTokenizeWord(w)
      toks.sliding(2).filter(_.length == 2).foreach { p =>
        val k = (p(0), p(1))
        cnt(k) = cnt.getOrElse(k, 0L) + f
        nDist(k) = nDist.getOrElse(k, Set.empty) + w
      }
    }
    val want = cnt.toSeq
      .map { case (k, c) => (k._1, k._2, c, nDist(k).size.toLong) }
      .sortBy { case (l, r, c, _) => (-c, l, r) }
      .take(20)
    assert(got === want)
  }
}
