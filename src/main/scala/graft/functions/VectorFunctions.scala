package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over Array[Float] columns — elements are cast to
  * double before accumulation so results are engine-stable. Both
  * primitives run inside whole-stage codegen: the element cast is
  * Spark's native array Cast, and the dot is the codegen'd
  * [[graft.plans.DotProduct]] (bit-identical to the zip_with/
  * aggregate HOF fold it replaced — HigherOrderFunction is
  * CodegenFallback, so the HOF paid interpreted per-element lambda
  * dispatch on every row of the similarity family's hot paths;
  * VectorFunctionsSpec pins the equivalence, nulls and length
  * mismatches included).
  */
object VectorFunctions {

  def toDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.GraftShim.column(
      graft.plans.DotProduct(
        org.apache.spark.sql.graftshim.GraftShim.expression(a),
        org.apache.spark.sql.graftshim.GraftShim.expression(b)))

  /** The interpreted HOF forms — kept ONLY as the equivalence
    * references for the codegen'd kernels (VectorFunctionsSpec);
    * production paths must use [[dot]]/[[toDouble]].
    */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private[graft] def toDoubleHof(v: Column): Column = transform(v, x => x.cast("double"))

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
