package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (Array[Float]):
  * brute-force cosine top-k as the exact baseline (FAISS-retriever
  * analog, reference pdf_rag_chatbot.py k=5), plus a random-
  * hyperplane LSH bucketed variant as the 100 TB path — buckets
  * bound the pair space, the broadcast query side never shuffles
  * the corpus.
  */
object Similarity {

  private def withVec(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), toDouble(col("embedding")).as("v"))

  /** Exact top-k by cosine for a set of query vectors. Ranking uses
    * the 6-dp-rounded score (ties broken by vec_id) so results are
    * stable across engines and runs.
    */
  def bruteForceTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val e = withVec(embeddings)
    val q = broadcast(
      e.filter(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("qid"), col("v").as("qv")))
    val scored = e
      .join(q, col("vec_id") =!= col("qid"))
      .withColumn("cos", round(cosine(col("qv"), col("v")), 6))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id").asc)
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id"), col("cos"), col("rnk"))
  }

  /** All embedding pairs with cosine >= threshold (near-dup sweep).
    * Exact form for verification; at scale route through lshTopK
    * buckets first.
    */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val e = withVec(embeddings)
    e.as("a")
      .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", round(cosine(col("a.v"), col("b.v")), 6))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"), col("cos"))
  }

  /** Random-hyperplane LSH bucket per vector: `planes` sign bits,
    * plane p's direction derived per-dimension from md5((p,i)) —
    * deterministic, no stored model. Vectors sharing a bucket are
    * candidate neighbors; exact cosine runs only within buckets.
    */
  def lshBuckets(embeddings: DataFrame, planes: Int = 8): DataFrame = {
    val e = withVec(embeddings)
      .select(col("vec_id"), posexplode(col("v")).as(Seq("i", "x")))
      .crossJoin(broadcast(
        org.apache.spark.sql.SparkSession.active.range(planes).select(col("id").cast("int").as("p"))))
      // deterministic +-1 direction for (plane, dim) from one md5 hex char
      .withColumn("dir",
        when(conv(substring(md5(concat(col("p"), lit(":"), col("i"))), 1, 1), 16, 10).cast("int") % 2 === 0, 1.0)
          .otherwise(-1.0))
      .groupBy(col("vec_id"), col("p"))
      .agg(sum(col("x") * col("dir")).as("proj"))
      .groupBy(col("vec_id"))
      .agg(sum(when(col("proj") > 0, expr("shiftleft(1L, p)")).otherwise(lit(0L))).as("bucket"))
    e
  }

  /** Bucketed near-dup: exact cosine only within LSH buckets. */
  def lshNearDupPairs(embeddings: DataFrame, threshold: Double, planes: Int = 8): DataFrame = {
    val b = lshBuckets(embeddings, planes)
    val e = withVec(embeddings).join(b, "vec_id")
    e.as("a")
      .join(e.as("b"), col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", round(cosine(col("a.v"), col("b.v")), 6))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"), col("cos"))
  }
}
