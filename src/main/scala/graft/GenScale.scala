package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic x`factor` replication of a driver fixture dir, used
  * ONLY for throughput-scaling measurements (never oracle-checked):
  * every fact table is replicated with consistent key-space offsets
  * (rep 0 is the identity, so the scaled dir contains the base dir),
  * dims (region/nation) pass through, and content columns are
  * perturbed so replicas do not collapse into degenerate workloads:
  *
  *  - document text is token-ROTATED per replica — replicas share a
  *    vocabulary but almost no shingles, so near-dup candidate
  *    volume scales ~linearly instead of every replica pairing with
  *    its original (x factor^2 pairs);
  *  - embeddings get a small deterministic per-(rep, index) additive
  *    perturbation for the same reason (a pure scalar multiple would
  *    keep cosine == 1 with the original);
  *  - events keep ts as the raw NANOS long the driver writes, so
  *    Tables.events/eventsRange read the scaled dir unchanged.
  *
  * All transforms are closed-form column expressions: the output is
  * a pure function of (input, factor), reproducible on any run or
  * cluster. Each fact table is written as one file per replica
  * (range-partition on the rep id) so the scaled fixture keeps the
  * base fixture's bytes-per-file — i.e. 10x data means 10x scan
  * tasks, the way a real 10x dataset lays out, not one 10x-size
  * row group that serializes every scan (see write()).
  */
object GenScale {

  /** Key offset per replica: larger than any base key space. */
  val Off = 1000000000L

  private def reps(factor: Int) =
    explode(sequence(lit(0L), lit(factor.toLong - 1))).as("rep")

  private def shift(c: String) = (col(c) + col("rep") * Off).as(c)

  /** Generate `outDir` from `inDir` if not already present (marker
    * file), returning whether a generation ran.
    */
  def ensure(spark: SparkSession, inDir: String, outDir: String, factor: Int): Boolean = {
    val marker = java.nio.file.Paths.get(outDir, "_GRAFT_SCALE_OK")
    // the marker fingerprints the base fixture's CONTENT (per-table
    // parquet footprints), not just its path: a regenerated fixture
    // at the same path must invalidate the cache, or the scale
    // section would divide new base times by stale scaled times.
    // EVERY replicated table participates — a regeneration that
    // changes documents/events/embeddings but leaves lineitem the
    // same size must still invalidate
    def footprint(table: String): Long = {
      val f = new java.io.File(s"$inDir/$table.parquet")
      if (f.isFile) f.length()
      else if (f.isDirectory)
        f.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      else -1L
    }
    val fp = Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .map(t => s"$t=${footprint(t)}").mkString(",")
    // layout= is the generator's OUTPUT-SHAPE/CONTENT version: bump
    // it when the written layout OR the replica transforms change, or
    // a cached fixture keeps the old characteristics under an
    // unchanged content hash (v6: events value jitter — see below)
    val want = s"factor=$factor from=$inDir layout=rep-files-v6 fp=$fp\n"
    if (java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == want) return false
    generate(spark, inDir, outDir, factor)
    java.nio.file.Files.createDirectories(marker.getParent)
    java.nio.file.Files.write(marker, want.getBytes("UTF-8"))
    true
  }

  def generate(spark: SparkSession, inDir: String, outDir: String, factor: Int): Unit = {
    // one output file PER REPLICA, not one per input task: the base
    // fixture is a single small file per table, so a naive write
    // produced ONE ~10x-size file = ONE parquet row group = ONE scan
    // task — every scan-stage-heavy query then measured serial
    // execution, not 10x data (q_redact_pii read 18x, q_filter_agg
    // 23x, both artifacts of the layout). A real 10x dataset has ~10x
    // the files at the same bytes/file; one filtered single-partition
    // write per replica reproduces exactly that. The per-rep loop is
    // DETERMINISTIC (rep r is exactly file r's content, every run) —
    // repartitionByRange picked bounds by sampling, which could merge
    // two reps into one file and leave another empty. Generation is
    // one-time (cache marker), so factor sequential writes per table
    // is cheap where a sampling surprise in the measured layout is not.
    def write(df: DataFrame, name: String, sortKeys: String*): Unit = {
      val path = s"$outDir/$name.parquet"
      if (df.columns.contains("rep"))
        (0L until factor.toLong).foreach { r =>
          df.filter(col("rep") === r).drop("rep")
            .coalesce(1)
            .sortWithinPartitions(sortKeys.map(col): _*)
            .write.mode(if (r == 0L) "overwrite" else "append").parquet(path)
        }
      else df.write.mode("overwrite").parquet(path)
    }

    def rawEvents = {
      // ts passes through in whatever physical form the fixture uses:
      // TIMESTAMP(NANOS) fixtures load as a raw int64 (nanosAsLong)
      // and are written back as int64; TIMESTAMP(MICROS) fixtures
      // load and write as plain timestamps. Tables.events adapts on
      // the loaded dtype either way.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      Tables.load(spark, inDir, "events")
    }

    // dims pass through
    write(Tables.region(spark, inDir), "region")
    write(Tables.nation(spark, inDir), "nation")

    write(
      Tables.customer(spark, inDir).withColumn("rep", reps(factor))
        .select(shift("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"), col("rep")),
      "customer", "c_custkey")
    write(
      Tables.supplier(spark, inDir).withColumn("rep", reps(factor))
        .select(shift("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"), col("rep")),
      "supplier", "s_suppkey")
    write(
      Tables.part(spark, inDir).withColumn("rep", reps(factor))
        .select(shift("p_partkey"), col("p_name"), col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice"), col("rep")),
      "part", "p_partkey")
    write(
      Tables.orders(spark, inDir).withColumn("rep", reps(factor))
        .select(shift("o_orderkey"), shift("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"), col("rep")),
      "orders", "o_orderkey")
    write(
      Tables.lineitem(spark, inDir).withColumn("rep", reps(factor))
        .select(shift("l_orderkey"), shift("l_partkey"), shift("l_suppkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
          col("l_returnflag"), col("l_linestatus"), col("l_shipdate"), col("rep")),
      "lineitem", "l_orderkey", "l_linenumber")
    // Replica VALUE series must genuinely differ (v6): a verbatim
    // copy leaves every replica of a key perfectly correlated with
    // it — identical return-sign patterns put all `factor` clones in
    // the same corr-LSH buckets and every clone pair passes any
    // |corr| threshold, so the corr family measured clique blowup
    // (x30 OOM'd q_corr_pairs_banded), not operator scaling — the
    // same degeneracy the token-suffix pass fixes for documents. A
    // deterministic ±6% per-event multiplicative jitter (closed form
    // of (event_id, rep), rep 0 identity) decorrelates the daily
    // return signs between replicas while preserving each replica's
    // internal structure; values stay positive.
    write(
      rawEvents.withColumn("rep", reps(factor))
        .select(shift("event_id"), col("ts"), shift("user_id"), col("event_type"),
          (col("value") * (lit(1.0) + least(col("rep"), lit(1L)) *
            (pmod(col("event_id") * 31 + col("rep") * 17, lit(13)) - 6) * 0.01)).as("value"),
          col("props"), col("rep")),
      "events", "event_id")
    // Replica documents must be genuinely DIFFERENT texts, or the
    // scaled corpus measures pair-density growth instead of operator
    // scaling: the original token ROTATION preserved (a) almost the
    // whole shingle set (a cyclic shift keeps every n-gram not
    // crossing the wrap point — J ~ (L-6)/L ~ 0.86 at the median
    // L=54, well above the 0.8 dedup threshold) and (b) the exact
    // token MULTISET (so SimHash distance was 0 between replicas).
    // Result: all C(factor,2) replica pairs of every doc were
    // genuine near-dups — 223k pairs at x10 vs 256 in the base, a
    // quadratic clique blowup that inflated every near-dup family's
    // x10 ratio (r8's simhash_neardup 12.0x most of all). Now HALF
    // the tokens (alternating positions, parity shifted per replica)
    // get a replica suffix: shingle overlap collapses to ~(1/2)^3
    // (J ~ 0.07, far under every threshold; LSH band-collision
    // probability ~2%), the token multiset differs in half its
    // members (SimHash distance >> 4), and within-replica structure
    // is preserved (both members of a base near-dup pair transform
    // consistently, so each replica keeps ~the base's internal
    // pairs: near-dup volume scales ~linearly with the factor, as a
    // real 10x corpus does). rep 0 stays the identity: the scaled
    // dir genuinely contains the base dir. Rotation is kept (nonzero
    // offset 1+(rep-1) mod (len-1) — the old rep*7 mod len was the
    // identity for 851 replicas) so exact-dedup sees distinct bytes
    // even on the positions the suffix pass leaves alone.
    write(
      Tables.documents(spark, inDir).withColumn("rep", reps(factor))
        .withColumn("toks", split(col("text"), " "))
        .withColumn("r",
          when(col("rep") === 0, lit(0))
            .otherwise(lit(1) + pmod(col("rep") - 1, greatest(size(col("toks")) - 1, lit(1))))
            .cast("int"))
        .withColumn("rot",
          concat(slice(col("toks"), col("r") + 1, size(col("toks")) - col("r")),
            slice(col("toks"), lit(1), col("r"))))
        .select(
          shift("doc_id"),
          when(col("rep") === 0, col("text"))
            .otherwise(array_join(
              transform(col("rot"), (t, i) =>
                when(pmod(i + col("rep"), lit(2)) === 0,
                  concat(t, lit("r"), col("rep").cast("string"))).otherwise(t)),
              " ")).as("text"),
          col("lang"), col("source"), col("n_chars"), col("rep")),
      "documents", "doc_id")
    write(
      Tables.embeddings(spark, inDir).withColumn("rep", reps(factor))
        .select(
          shift("vec_id"),
          // least(rep, 1) zeroes the perturbation at rep 0 so the
          // scaled dir genuinely CONTAINS the base dir (the doc
          // rotation is already identity at rep 0: r = 0)
          transform(col("embedding"), (x, i) =>
            (x + (least(col("rep"), lit(1L)) *
              (pmod(col("rep") * 31 + i * 17, lit(13)) - 6) * 0.01).cast("float")).cast("float"))
            .as("embedding"),
          col("label"), col("rep")),
      "embeddings", "vec_id")
  }

  /** CLI: GenScale <inDir> <outDir> [factor]. Marker-aware like the
    * bench path (a fixture the CLI generated must not be regenerated
    * by the next bench run, and vice versa).
    */
  def main(args: Array[String]): Unit = {
    val inDir  = args(0)
    val outDir = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark  = Session.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val ran    = ensure(spark, inDir, outDir, factor)
    println(s"${if (ran) "generated" else "cache hit:"} $outDir at x$factor from $inDir")
    spark.stop()
  }
}
