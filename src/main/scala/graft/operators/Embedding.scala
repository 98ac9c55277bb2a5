package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Deterministic text embedding + end-to-end RAG retrieval, closing
  * the reference's splitter -> embedder -> FAISS loop (reference
  * pdf_rag_chatbot.py:55-60) on raw documents with no model
  * download: the embedder is the feature-hashing trick (Weinberger
  * ICML'09) — token -> md5 -> (bucket, sign) -> signed count vector.
  *
  * Scale notes: embedding is a per-row fold over the token array
  * (one md5 per token, codegen'd higher-order functions) — zero
  * shuffle, the same shape as the MinHash/SimHash signatures.
  * Retrieval orders by score and LIMITs, which Spark plans as
  * TakeOrderedAndProject: per-partition partial top-k + a k-row
  * driver merge, never a global sort.
  */
object Embedding {

  /** Feature-hash embedding of a text column: each token lands in
    * bucket md5_lane1 % dim with sign +-1 from md5_lane2 — vector
    * components are small integers, so downstream dot/norm doubles
    * are exact and engine-identical.
    */
  def featureHashVec(text: Column, dim: Int): Column = {
    val toks = split(lower(text), " ")
    val hashed = transform(toks, t =>
      struct(
        pmod(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), lit(dim)).as("b"),
        (lit(1.0) - lit(2.0) * pmod(conv(substring(md5(t), 9, 1), 16, 10).cast("long"), lit(2)).cast("double")).as("sg")
      ))
    transform(sequence(lit(0), lit(dim - 1)), i =>
      aggregate(hashed, lit(0.0), (acc, h) => acc + when(h("b") === i.cast("long"), h("sg")).otherwise(lit(0.0))))
  }

  /** (doc_id, chunk_id, v): embedding per chunk. */
  def embedChunks(chunks: DataFrame, dim: Int = 16): DataFrame =
    chunks.select(col("doc_id"), col("chunk_id"), featureHashVec(col("chunk"), dim).as("v"))

  /** Full RAG retrieval: chunk -> embed -> cosine top-k for a query
    * string, rank 1..k. The query vector is a literal fold — no
    * second scan, no join; scoring is narrow over the chunk stream.
    */
  def ragRetrieve(
      documents: DataFrame,
      query: String,
      size: Int = 100,
      overlap: Int = 20,
      dim: Int = 16,
      k: Int = 5
  ): DataFrame = {
    val emb = embedChunks(TextAnalysis.chunk(documents, size, overlap), dim)
      .withColumn("qv", featureHashVec(lit(query), dim))
    val scored = emb
      .withColumn("denom", norm(col("v")) * norm(col("qv")))
      .withColumn("cos", when(col("denom") =!= 0, dot(col("v"), col("qv")) / col("denom")))
      .filter(col("cos").isNotNull)
      .select(col("doc_id"), col("chunk_id"), col("cos"))
    // TakeOrderedAndProject: partial top-k per partition, k-row merge
    val topk = scored.orderBy(col("cos").desc, col("doc_id").asc, col("chunk_id").asc).limit(k)
    topk.withColumn("rnk",
      row_number().over(Window.orderBy(col("cos").desc, col("doc_id").asc, col("chunk_id").asc)).cast("long"))
  }
}
