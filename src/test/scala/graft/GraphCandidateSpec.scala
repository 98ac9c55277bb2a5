package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Subset-of-exact invariants for the graph family's celled DEFAULT
  * edge builder ([[Similarity.knnCandidatePairs]]) — the
  * q_semantic_dedup pattern applied to the kNN-graph head. Whatever
  * the quantizer does, three things must hold: every celled pair IS
  * an exact pair with a bit-equal score (same block kernel), the
  * candidate volume is strictly below the full pair space, and the
  * exact=true opt-in still produces the true k-regular kNN graph
  * that dominates the celled one edge-for-edge.
  */
class GraphCandidateSpec extends AnyFunSuite {
  import TestSession._

  private lazy val emb = Tables.embeddings(spark, sf)

  test("celled candidate pairs are a subset of the exact sweep with bit-equal scores") {
    // explicit 8-cell quantizer: the fixture (50 vectors) sits below
    // knnCandidatePairs' celling floor, so the genuinely-celled
    // invariants are pinned against ivfNearDupPairs directly
    val cents  = Similarity.ivfTrain(emb, nlist = 8, iters = 0)
    val celled = Similarity.ivfNearDupPairs(emb, -2.0, cents)
      .select(col("va"), col("vb"), col("cos").as("cc"))
    val exact = Similarity.cosineNearDupPairs(emb, -2.0).select(col("va"), col("vb"), col("cos").as("ce"))
    val nC = celled.count()
    val nE = exact.count()
    assert(nC > 0, "celled builder produced no candidate pairs")
    assert(nC < nE, s"candidate volume $nC not below the exact pair space $nE")
    val joined = celled.join(exact, Seq("va", "vb"))
    assert(joined.count() === nC, "a celled pair is missing from the exact sweep")
    val drift = joined.filter(col("cc") =!= col("ce")).count()
    assert(drift === 0, "celled scores drift from the exact kernel")
  }

  test("below the celling floor knnCandidatePairs IS the exact sweep (nlist = 1)") {
    val celled = Similarity.knnCandidatePairs(emb).select(col("va"), col("vb"), col("cos"))
    val exact  = Similarity.cosineNearDupPairs(emb, -2.0).select(col("va"), col("vb"), col("cos"))
    assert(emb.count() <= 512, "fixture grew past the floor: move this test to a smaller slice")
    assert(celled.exceptAll(exact).count() === 0 && exact.exceptAll(celled).count() === 0,
      "floor corpora must lose zero recall")
    // and a corpus too small to seed 16 cells must not throw
    val tiny = emb.limit(5)
    assert(Similarity.knnGraph(tiny, 2).count() > 0)
  }

  test("exact=true restores the k-regular kNN graph and dominates the celled graph per edge rank") {
    val k = 5
    val exactG  = Similarity.knnGraph(emb, k, exact = true)
      .select(col("src"), col("rnk"), col("cos").as("ce"))
    val celledG = Similarity.knnGraph(emb, k)
      .select(col("src"), col("rnk"), col("cos").as("cc"))
    val n = emb.count()
    // true kNN graph: every node has exactly min(k, n-1) out-edges
    val degBad = exactG.groupBy("src").agg(count(lit(1)).as("d"))
      .filter(col("d") =!= math.min(k, n - 1)).count()
    assert(degBad === 0, "exact kNN graph is not k-regular")
    // rank dominance: at every (src, rnk) the exact neighbor is at
    // least as close as the celled one (the celled graph picks from
    // a subset of the exact candidate set)
    val dom = celledG.join(exactG, Seq("src", "rnk"))
    assert(dom.filter(col("ce") < col("cc")).count() === 0,
      "a celled edge outranks the exact graph at the same rank")
  }

  test("celled knnClassify votes only come from the query's own cell") {
    // structural: with the exact flag the candidate pool is the full
    // corpus, so accuracy can only go up or stay equal in vote count
    val celled = Similarity.knnClassify(emb)
    val exact  = Similarity.knnClassify(emb, exact = true)
    assert(celled.count() > 0)
    assert(celled.count() === exact.count(),
      "query slice must be identical under both candidate policies")
  }
}
