package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Byte-stability under partition-count variation for the two
  * operators a migration sign-off leans on hardest: the dataset
  * profile (q_profile_table) and the A/B reconciliation
  * (q_reconcile). Their outputs mix counts, formatted timestamps and
  * rounded floats; the driver's gate hashes BYTES, so these must be
  * bit-identical — not just value-equal — at any shuffle/scan
  * partitioning. Doubles are compared via their raw IEEE bit
  * patterns (doubleToRawLongBits), the same discrimination a byte
  * hash applies (+0.0 vs -0.0 included).
  */
class ByteStabilitySpec extends AnyFunSuite {
  import TestSession._

  private def withConf[A](kv: (String, String)*)(body: => A): A = {
    val saved = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def bitImage(df: DataFrame): Seq[String] =
    df.collect()
      .map(_.toSeq.map {
        case d: java.lang.Double => "d:" + java.lang.Double.doubleToRawLongBits(d)
        case f: java.lang.Float  => "f:" + java.lang.Float.floatToRawIntBits(f)
        case x                   => String.valueOf(x)
      }.mkString(""))
      .sorted
      .toSeq

  private def assertStable(name: String): Unit = {
    val q = SparkEntry.queries(name)
    val wide = withConf(
      "spark.sql.shuffle.partitions"    -> "32",
      "spark.sql.files.maxPartitionBytes" -> "134217728")(bitImage(q(spark, sf)))
    val narrow = withConf(
      "spark.sql.shuffle.partitions"    -> "5",
      "spark.sql.files.maxPartitionBytes" -> "262144")(bitImage(q(spark, sf)))
    assert(wide.nonEmpty, s"$name returned no rows")
    assert(wide == narrow,
      s"$name output is partitioning-sensitive: ${wide.diff(narrow).take(3)} vs ${narrow.diff(wide).take(3)}")
  }

  test("q_profile_table is byte-stable across shuffle/scan partitioning") {
    assertStable("q_profile_table")
  }

  test("q_reconcile is byte-stable across shuffle/scan partitioning") {
    assertStable("q_reconcile")
  }

  // the rest of the migration sign-off panel: corpus/dataset health
  // summaries someone diffs against the legacy system before cutover
  test("q_metrics_summary is byte-stable across shuffle/scan partitioning") {
    assertStable("q_metrics_summary")
  }

  test("q_corpus_stats is byte-stable across shuffle/scan partitioning") {
    assertStable("q_corpus_stats")
  }

  test("q_fk_integrity is byte-stable across shuffle/scan partitioning") {
    assertStable("q_fk_integrity")
  }

  test("q_dedup_exact is byte-stable across shuffle/scan partitioning") {
    assertStable("q_dedup_exact")
  }

  test("q_distinct_counts is byte-stable across shuffle/scan partitioning") {
    assertStable("q_distinct_counts")
  }
}
