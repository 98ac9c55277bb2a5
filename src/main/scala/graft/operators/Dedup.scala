package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family for large-scale corpus curation: exact
  * (hash groupBy), n-gram Jaccard, MinHash+LSH banding, SimHash.
  *
  * Scale design: everything funnels through shingle/token explosion
  * followed by key-partitioned aggregation — the pair space is never
  * materialized except within LSH candidate buckets (banding bounds
  * bucket width), so cost is O(corpus) + O(candidates), not O(n^2).
  * All hashes are md5-derived so any SQL engine reproduces them.
  */
object Dedup {

  /** Distinct word shingles of width `n` per document. */
  def shingles(documents: DataFrame, n: Int = 3): DataFrame = {
    val toks   = split(lower(col("text")), " ")
    val last   = size(toks) - (n - 1)
    val starts = when(last >= 1, sequence(lit(1), last)).otherwise(array())
    documents
      .select(
        col("doc_id"),
        explode(transform(starts, i => concat_ws(" ", slice(toks, i, lit(n))))).as("s")
      )
      .distinct()
  }

  /** Exact dedup: canonical id + copy count per normalized-text hash. */
  def exact(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(lower(col("text"))).as("fp"))
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Near-duplicate pairs by n-gram Jaccard >= threshold. The
    * shingle join only pairs docs sharing at least one shingle —
    * disjoint docs never meet.
    */
  def ngramJaccardPairs(documents: DataFrame, n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh    = shingles(documents, n).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("n_sh", "na"), "da")
      .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("n_sh", "nb"), "db")
      .withColumn("jaccard", round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("da"), col("db"), col("jaccard"))
  }

  /** MinHash signatures: k independent "permutations" realized as
    * min over md5(j || ':' || shingle) strings — engine-portable and
    * a valid uniform hash family.
    */
  def minhash(documents: DataFrame, k: Int = 8, n: Int = 3): DataFrame =
    shingles(documents, n)
      .crossJoin(broadcast(org.apache.spark.sql.SparkSession.active.range(k).select(col("id").as("j"))))
      .groupBy(col("doc_id"), col("j"))
      .agg(min(md5(concat(col("j").cast("string"), lit(":"), col("s")))).as("m"))

  /** LSH banding (specialized to 2 minhash rows per band): signature
    * per (doc, band) = md5 of the band's two minhash rows; docs
    * sharing any band signature are candidates.
    */
  def minhashLshCandidates(documents: DataFrame, k: Int = 8, n: Int = 3): DataFrame = {
    val sig = minhash(documents, k, n)
      .groupBy(col("doc_id"), (col("j") / 2).cast("long").as("band"))
      .agg(
        md5(concat(
          min(when(col("j") % 2 === 0, col("m"))),
          min(when(col("j") % 2 === 1, col("m")))
        )).as("sig")
      )
    sig.as("a")
      .join(sig.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
  }

  /** 60-bit SimHash over the token multiset, hashes from md5 hex.
    * The per-bit explode is fine at corpus scale for verification;
    * the 100 TB path is a custom TypedImperativeAggregate that folds
    * tokens into the 60 counters in one pass (SURVEY §7).
    */
  def simhash(documents: DataFrame): DataFrame = {
    val toks = split(lower(col("text")), " ")
    documents
      .select(col("doc_id"), explode(toks).as("t"))
      .withColumn("h", conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long"))
      .crossJoin(broadcast(org.apache.spark.sql.SparkSession.active.range(60).select(col("id").cast("int").as("b"))))
      .withColumn("contrib", when(expr("shiftright(h, b) % 2") === 1, lit(1)).otherwise(lit(-1)))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum("contrib").as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("s") > 0, expr("shiftleft(1L, b)")).otherwise(lit(0L))).as("simhash"))
  }

  /** Near-dup pairs by SimHash hamming distance <= maxDist —
    * library-level helper (pairs all docs; use LSH bucketing on
    * simhash prefixes for the at-scale path).
    */
  def simhashPairs(sims: DataFrame, maxDist: Int): DataFrame =
    sims.as("a")
      .join(sims.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("dist", bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))))
      .filter(col("dist") <= maxDist)
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"), col("dist"))
}
