package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the operators whose composed-
  * plan form needs a token/shingle explode + shuffle: here the whole
  * fold runs per row inside the scan stage, so the 100 TB corpus
  * never shuffles raw tokens at all — output is one signature row
  * per document.
  *
  * Semantics are bit-identical to the composed plans in
  * graft.operators.Dedup (asserted in DedupSimilaritySpec), which is
  * also what the SQL oracles check.
  */
object GraftHash {
  private val hexDigits = "0123456789abcdef".toCharArray

  def md5hex(md: MessageDigest, s: String): String = {
    md.reset()
    val d  = md.digest(s.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(32)
    var i  = 0
    while (i < d.length) {
      sb.append(hexDigits((d(i) >> 4) & 0xf)); sb.append(hexDigits(d(i) & 0xf)); i += 1
    }
    sb.toString
  }
}

/** k-permutation MinHash signature of a document's distinct word
  * `n`-gram shingles; permutation j = min md5("j:" || shingle).
  * Returns array<string> of length k, or null when the text has no
  * shingle (fewer than n tokens).
  */
case class MinHashSig(child: Expression, k: Int, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean  = true
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.toLowerCase.split(" ", -1)
    if (toks.length < n) return null
    val seen = new java.util.HashSet[String]()
    val md   = MessageDigest.getInstance("MD5")
    val mins = new Array[String](k)
    var i    = 0
    while (i + n <= toks.length) {
      val sh = toks.slice(i, i + n).mkString(" ")
      if (seen.add(sh)) {
        var j = 0
        while (j < k) {
          val h = GraftHash.md5hex(md, j.toString + ":" + sh)
          if (mins(j) == null || h.compareTo(mins(j)) < 0) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig = copy(child = newChild)
}

/** 60-bit SimHash over the token multiset; token hash = first 15 hex
  * chars of md5 parsed base-16 (= conv(substr(md5(t),1,15),16,10)).
  */
case class SimHash60(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val toks     = input.asInstanceOf[UTF8String].toString.toLowerCase.split(" ", -1)
    val md       = MessageDigest.getInstance("MD5")
    val counters = new Array[Int](60)
    var i        = 0
    while (i < toks.length) {
      val h = java.lang.Long.parseLong(GraftHash.md5hex(md, toks(i)).substring(0, 15), 16)
      var b = 0
      while (b < 60) {
        if (((h >> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b   = 0
    while (b < 60) { if (counters(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60 = copy(child = newChild)
}

/** Runtime registration (Verify/Bench path) and a
  * SparkSessionExtensions hook for cluster deployments
  * (--conf spark.sql.extensions=graft.plans.GraftExtensions).
  */
object GraftFunctions {
  val all: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("graft_minhash_sig", (es: Seq[Expression]) => MinHashSig(es.head, 8, 3), "returns the 8x3 minhash signature of a text"),
    ("graft_simhash", (es: Seq[Expression]) => SimHash60(es.head), "returns the 60-bit simhash of a text"),
    ("graft_ema", (es: Seq[Expression]) =>
      EmaAggregate(es(0), es(1), es(2).eval().asInstanceOf[Number].intValue()),
      "aggregate: final EMA(span, adjust=False) of values in ts order")
  )

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder, _) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder, _) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.plans.Expressions", name),
        builder))
    }
}
