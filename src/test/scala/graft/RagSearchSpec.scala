package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ParseFunctions
import graft.operators.{Embedding, Relational, TextAnalysis}

class RagSearchSpec extends AnyFunSuite {
  import TestSession._

  test("feature-hash embedding: fixed dim, deterministic, equal text -> equal vector") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(50)
    val emb  = Embedding.embedChunks(TextAnalysis.chunk(docs, 100, 20))
    val row  = emb.select(size($"v").as("d")).distinct().collect()
    assert(row.map(_.getInt(0)).toSeq === Seq(16))
    // same text twice -> identical vectors
    val twice = spark.createDataset(Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma")))
      .toDF("doc_id", "chunk").withColumn("chunk_id", lit(0L))
    val vs = Embedding.embedChunks(twice).select($"v").collect().map(_.getSeq[Double](0))
    assert(vs(0) === vs(1))
  }

  test("codegen'd feature-hash expression is bit-identical to the composed fold") {
    import spark.implicits._
    val chunks = TextAnalysis.chunk(Tables.documents(spark, sf), 100, 20)
    val fast     = Embedding.embedChunks(chunks)
    val composed = Embedding.embedChunksComposed(chunks)
    assert(fast.exceptAll(composed).count() === 0 && composed.exceptAll(fast).count() === 0)
    // and to the driver-side literal twin
    val local = Embedding.featureHashVecLocal("alpha beta gamma", 16).toSeq
    val dist = Embedding.embedChunks(
      Seq((0L, 0L, "alpha beta gamma")).toDF("doc_id", "chunk_id", "chunk"))
      .select($"v").head().getSeq[Double](0)
    assert(dist === local)
  }

  test("rag retrieval returns k ranked chunks, scores descending") {
    import spark.implicits._
    val out = Embedding.ragRetrieve(Tables.documents(spark, sf), "fast spark query join merge")
    val rows = out.orderBy($"rnk").collect()
    assert(rows.length === 5)
    assert(rows.map(_.getAs[Long]("rnk")).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    val scores = rows.map(_.getAs[Double]("cos"))
    assert(scores.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("batch retrieval with one query matches the single-query path") {
    import spark.implicits._
    val docs   = Tables.documents(spark, sf)
    val single = Embedding.ragRetrieve(docs, "fast spark query join merge")
      .select($"doc_id", $"chunk_id", $"cos", $"rnk")
    val batch = Embedding.ragRetrieveBatch(
      docs, Seq((7L, "fast spark query join merge")).toDF("qid", "query"))
      .select($"doc_id", $"chunk_id", $"cos", $"rnk")
    assert(single.exceptAll(batch).count() === 0 && batch.exceptAll(single).count() === 0)
    // multi-query: k rows per qid, ranks 1..k
    val multi = Embedding.ragRetrieveBatch(
      docs, Seq((1L, "gain up good"), (2L, "slow error bad")).toDF("qid", "query"))
    assert(multi.groupBy($"qid").count().collect().map(_.getLong(1)).toSeq === Seq(5L, 5L))
  }

  test("percent/currency parsing: values and null-on-malformed") {
    import spark.implicits._
    val in = Seq("12.5%", " 7% ", "-3.25%", "12.5", "n/a", "%").toDF("s")
    val pct = in.select(ParseFunctions.parsePercent($"s").as("v")).collect().map(r => Option(r.get(0)))
    assert(pct.toSeq === Seq(Some(12.5), Some(7.0), Some(-3.25), None, None, None))
    val cin = Seq("$1.25B", "$45M", "$2K", "$123.45", "1.25B", "$x").toDF("s")
    val cur = cin.select(ParseFunctions.parseCurrency($"s").as("v")).collect().map(r => Option(r.get(0)))
    assert(cur.toSeq === Seq(Some(1.25e9), Some(4.5e7), Some(2000.0), Some(123.45), None, None))
  }

  test("symbol search ranks exact < prefix < contains") {
    import spark.implicits._
    val dim = Seq((1L, "small"), (2L, "small widget"), (3L, "extra small bolt"), (4L, "large gear"))
      .toDF("k", "name")
    val out = Relational.symbolSearch(dim, "small", "k", "name")
      .orderBy($"match_rank", $"k").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq === Seq((1L, 0L), (2L, 1L), (3L, 2L)))
  }

  test("pivot fillZero leaves no nulls and preserves non-null cells") {
    import spark.implicits._
    val types  = Seq("click", "error", "purchase", "signup", "view")
    val events = Tables.events(spark, sf)
    val plain  = Relational.pivotWide(events, types)
    val filled = Relational.pivotWide(events, types, fillZero = true)
    val nulls  = types.map(t => sum(when(col(t).isNull, 1).otherwise(0))).reduce(_ + _)
    assert(filled.select(nulls.as("n")).head().getLong(0) === 0L)
    // non-null cells unchanged
    val joined = plain.as("p").join(filled.as("f"), col("p.day") === col("f.day"))
    val diffs = types.map(t =>
      sum(when(col(s"p.$t").isNotNull && col(s"p.$t") =!= col(s"f.$t"), 1).otherwise(0))).reduce(_ + _)
    assert(joined.select(diffs.as("n")).head().getLong(0) === 0L)
  }

  test("random projection matches the local sign-matrix fold and preserves norms on average") {
    import TestSession.spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val got = Embedding.randomProject(emb, 8, 64)
    assert(got.count() === emb.count() * 8)
    // bit-level check of one vector against a local sequential fold
    // over the same md5 sign matrix
    val signs = Embedding.signMatrix(8, 64)
    val first = emb.orderBy($"vec_id").head()
    val v     = first.getSeq[Float](first.fieldIndex("embedding")).map(_.toDouble)
    val wantP = signs.map(row => v.zip(row).foldLeft(0.0) { case (acc, (x, s)) => acc + x * s })
    val gotP = got.filter($"vec_id" === first.getLong(first.fieldIndex("vec_id")))
      .orderBy($"j").collect().map(_.getAs[Double]("p"))
    gotP.zip(wantP).foreach { case (g, w) =>
      assert(math.abs(g - BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    // JL property: E[p_j^2] = |v|^2 per output dim — the corpus
    // average of sum(p^2)/r over |v|^2 concentrates near 1
    val n2 = emb.select($"vec_id",
      graft.functions.VectorFunctions.dot(
        graft.functions.VectorFunctions.toDouble($"embedding"),
        graft.functions.VectorFunctions.toDouble($"embedding")).as("n2"))
    val ratio = got.groupBy($"vec_id").agg(sum($"p" * $"p").as("pp"))
      .join(n2, "vec_id").filter($"n2" > 0)
      .agg(avg($"pp" / ($"n2" * 8))).head().getDouble(0)
    assert(ratio > 0.7 && ratio < 1.3, s"JL norm-preservation ratio $ratio")
  }

  test("pq codes: m codes per vector in range; codebook members quantize to themselves") {
    import TestSession.spark
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSession.sf)
    val pq  = graft.operators.Embedding.pqCodes(emb, m = 8, nc = 16).cache()
    // exactly m rows per vector, codes in [0, nc)
    assert(pq.groupBy($"vec_id").count().filter($"count" =!= 8).count() === 0)
    assert(pq.filter($"code" < 0 || $"code" >= 16).count() === 0)
    // a codebook member's own subvectors are at distance 0 in every
    // subspace (whatever code wins the tie)
    assert(pq.filter($"vec_id" < 16 && $"dist" =!= 0.0).count() === 0)
    // distances are non-negative
    assert(pq.filter($"dist" < 0).count() === 0)
    pq.unpersist()
  }

  test("common neighbors equals a local recompute over the kNN edge set") {
    import TestSession.spark
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSession.sf)
    val edges = graft.operators.Similarity.knnGraph(emb, 5)
      .select($"src", $"dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = (for {
      (a, na) <- nbrs.toSeq; (b, nb) <- nbrs.toSeq if a < b
      common = (na & nb).size if common >= 2
    } yield (a, b) -> (common.toLong, na.size.toLong, nb.size.toLong,
      common.toDouble / (na.size + nb.size - common))).toMap
    val got = graft.operators.Similarity.commonNeighbors(emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("common"), r.getAs[Long]("da"), r.getAs[Long]("db"),
          r.getAs[Double]("jaccard"))).toMap
    assert(got.keySet === want.keySet, "pair set must match the local recompute exactly")
    got.foreach { case (k, v) => assert(v === want(k), s"pair $k mismatch: $v vs ${want(k)}") }
    // structural sanity: common can never exceed either degree
    got.foreach { case (_, (c, da, db, j)) =>
      assert(c <= math.min(da, db) && j > 0 && j <= 1.0)
    }
  }

  test("pq distortion: exact aggregate of the pqCodes distances, shares sum to 1") {
    import TestSession.spark
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSession.sf)
    val codes = graft.operators.Embedding.pqCodes(emb, 8, 16)
      .select($"j", $"dist").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = codes.groupBy(_._1).view.mapValues { rs =>
      val du = rs.map(r => math.round(r._2 * 1000000))
      (rs.length.toLong, du.sum, du.max)
    }.toMap
    val totalU = want.values.map(_._2).sum
    val got = graft.operators.Embedding.pqDistortion(emb, 8, 16).collect()
    assert(got.length === 8)
    got.foreach { r =>
      val (n, su, mxu) = want(r.getLong(0))
      assert(r.getAs[Long]("n_vecs") === n)
      assert(r.getAs[Double]("mean_sq_dist") === su.toDouble / n / 1000000)
      assert(r.getAs[Double]("max_sq_dist") === mxu.toDouble / 1000000)
      assert(r.getAs[Double]("distortion_share") === su.toDouble / totalU)
    }
    val shares = got.map(_.getAs[Double]("distortion_share")).sum
    assert(math.abs(shares - 1.0) < 1e-12)
  }

  test("degree assortativity equals the local Pearson over the kNN edge degrees") {
    import TestSession.spark
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSession.sf)
    val edges = graft.operators.Similarity.knnGraph(emb, 5)
      .select($"src", $"dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val xs = edges.map { case (s, d) => (deg(s), deg(d)) }
    val n = xs.length.toDouble
    val (sx, sy)  = (xs.map(_._1).sum.toDouble, xs.map(_._2).sum.toDouble)
    val sxy = xs.map(p => p._1 * p._2).sum.toDouble
    val sxx = xs.map(p => p._1 * p._1).sum.toDouble
    val syy = xs.map(p => p._2 * p._2).sum.toDouble
    val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
    val got = graft.operators.Similarity.degreeAssortativity(emb, 5).head()
    assert(got.getAs[Long]("n_edges") === edges.length.toLong)
    if (vx > 0 && vy > 0) {
      val want = (n * sxy - sx * sy) / math.sqrt(vx * vy)
      assert(math.abs(got.getAs[Double]("assortativity") - want) < 1e-12)
      assert(math.abs(got.getAs[Double]("assortativity")) <= 1.0)
    } else
      assert(got.isNullAt(got.fieldIndex("assortativity")),
        "a degree-regular graph has no defined assortativity")
  }

  test("knn classify agrees with bruteForceTopK + a local majority vote") {
    import TestSession.spark
    import spark.implicits._
    val emb  = Tables.embeddings(spark, TestSession.sf)
    val qids = emb.filter($"vec_id" % 20 === 0).select($"vec_id")
      .collect().map(_.getLong(0)).toSeq
    val labels = emb.select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // reference: exact top-k among NON-holdout candidates, majority
    // vote with the (votes desc, label asc) tie-break
    val cand = emb.filter($"vec_id" % 20 =!= 0)
      .select($"vec_id", $"label", $"embedding")
    // k widened by the holdout count so dropping holdout neighbors
    // still leaves the true top-5 among candidates
    val top = graft.operators.Similarity
      .bruteForceTopK(cand.unionByName(emb.filter($"vec_id".isin(qids: _*))
        .select($"vec_id", $"label", $"embedding")), qids, 5 + qids.size)
      .filter($"vec_id" % 20 =!= 0) // neighbors drawn from candidates only
    val wantPred = top.collect().groupBy(_.getLong(0)).map { case (qid, rows) =>
      val votes = rows.sortBy(_.getAs[Long]("rnk")).take(5)
        .groupBy(r => labels(r.getLong(1))).view.mapValues(_.length).toMap
      qid -> votes.toSeq.sortBy { case (l, v) => (-v, l) }.head._1
    }
    val got = graft.operators.Similarity.knnClassify(emb, 20L, 5, exact = true).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === wantPred.keySet)
    got.foreach { case (qid, r) =>
      assert(r.getAs[Int]("predicted_label") === wantPred(qid), s"query $qid")
      assert(r.getAs[Int]("q_label") === labels(qid))
      assert(r.getAs[Boolean]("correct") === (wantPred(qid) === labels(qid)))
    }
  }
}
