package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** Pins the codegen'd vector kernels (DotProduct, native array Cast)
  * bit-identical to the interpreted HOF chains they replaced — the
  * similarity family's oracle contracts fold dots in element order,
  * so the kernel must reproduce the exact IEEE sequence AND the HOF's
  * null/length-mismatch semantics.
  */
class VectorFunctionsSpec extends AnyFunSuite {
  import TestSession._

  test("dot kernel: bit-identical to the zip_with/aggregate HOF, nulls and mismatches included") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq[java.lang.Double](1.5, -2.25, 3.125), Seq[java.lang.Double](0.5, 4.0, -1.0)),
      (2L, Seq[java.lang.Double](), Seq[java.lang.Double]()),                     // empty -> 0.0
      (3L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)),          // length mismatch -> null
      (4L, Seq[java.lang.Double](1.0, null, 2.0), Seq[java.lang.Double](1.0, 1.0, 1.0)), // null element -> null
      (5L, null, Seq[java.lang.Double](1.0)),                                    // null side -> null
      (6L, Seq[java.lang.Double](1e300, 1e300, -1e300), Seq[java.lang.Double](1e10, -1e10, 1e10)),
      // non-associative case: order of accumulation must match exactly
      (7L, Seq[java.lang.Double](1e16, 1.0, -1e16), Seq[java.lang.Double](1.0, 1.0, 1.0)))
      .toDF("id", "a", "b")
    val got = rows.select(col("id"),
        VectorFunctions.dot(col("a"), col("b")).as("k"),
        VectorFunctions.dotHof(col("a"), col("b")).as("h"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2),
        s"id=${r.getLong(0)}: null-ness differs (kernel=${r.isNullAt(1)}, HOF=${r.isNullAt(2)})")
      if (!r.isNullAt(1))
        // raw-bits compare: NaN == NaN here, and any ULP drift fails
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ===
          java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
          s"id=${r.getLong(0)}: kernel ${r.getDouble(1)} != HOF ${r.getDouble(2)}")
    }
  }

  test("dot kernel on long arrays: wrapping long multiply matches the HOF (the int8 quantized path)") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq[java.lang.Long](3L, -4L, 5L), Seq[java.lang.Long](7L, 2L, -1L)),
      (2L, Seq[java.lang.Long](1L << 40, -(1L << 20)), Seq[java.lang.Long](1L << 20, 1L << 40)),
      (3L, Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L, 1L)))
      .toDF("id", "a", "b")
    val got = rows.select(col("id"),
        VectorFunctions.dot(col("a"), col("b")).as("k"),
        VectorFunctions.dotHof(col("a"), col("b")).as("h"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"id=${r.getLong(0)}: null-ness differs")
      if (!r.isNullAt(1))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ===
          java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
          s"id=${r.getLong(0)}: kernel ${r.getDouble(1)} != HOF ${r.getDouble(2)}")
    }
    // overflow: ANSI mode makes the HOF throw; the kernel must fail
    // loudly too, never silently wrap
    val of = Seq((1L, Seq(Long.MaxValue, 2L), Seq(2L, 3L))).toDF("id", "a", "b")
    intercept[Throwable] { of.select(VectorFunctions.dot(col("a"), col("b"))).collect() }
    intercept[Throwable] { of.select(VectorFunctions.dotHof(col("a"), col("b"))).collect() }
    // mixed long·double promotion path
    val m = rows.select(
        VectorFunctions.dot(col("a"), transform(col("b"), x => x.cast("double") / lit(3.0))).as("k"),
        VectorFunctions.dotHof(col("a"), transform(col("b"), x => x.cast("double") / lit(3.0))).as("h"))
      .collect()
    m.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), "mixed: null-ness differs")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)), "mixed path bits differ")
    }
  }

  test("toDouble: native array cast matches the element-wise transform on floats") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq[java.lang.Float](1.5f, -0.1f, 3.4028235e38f)),
      (2L, Seq[java.lang.Float]()),
      (3L, Seq[java.lang.Float](0.1f, null, -0.0f)),
      (4L, null))
      .toDF("id", "v")
    val got = rows.select(col("id"),
        VectorFunctions.toDouble(col("v")).as("k"),
        VectorFunctions.toDoubleHof(col("v")).as("h"))
      .collect()
    got.foreach { r =>
      val k = if (r.isNullAt(1)) null else r.getSeq[java.lang.Double](1)
      val h = if (r.isNullAt(2)) null else r.getSeq[java.lang.Double](2)
      assert(k === h, s"id=${r.getLong(0)}: cast $k != transform $h")
    }
  }

  test("dot on the fixture: kernel and HOF agree bit-exactly over every embedding pair with the query vector") {
    val emb = Tables.embeddings(spark, sf)
    val v   = VectorFunctions.toDouble(col("embedding"))
    val n = emb.select(
        VectorFunctions.dot(v, v).as("k"),
        VectorFunctions.dotHof(VectorFunctions.toDoubleHof(col("embedding")),
          VectorFunctions.toDoubleHof(col("embedding"))).as("h"))
      .filter(col("k") =!= col("h"))
      .count()
    assert(n === 0L, s"$n fixture rows disagree between kernel and HOF dot")
  }
}
