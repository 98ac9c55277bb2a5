package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

object TestSession {
  lazy val spark: SparkSession = Session.local(4)
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSession._

  test("entry smoke: flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query key with an oracle exists in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("latest_per_key yields exactly one row per key") {
    val df = Relational.latestPerKey(Tables.events(spark, sf))
    import spark.implicits._
    val dup = df.groupBy($"user_id").count().filter($"count" > 1).count()
    assert(dup === 0)
  }

  test("salted join returns exactly the plain join's rows") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val o  = Tables.orders(spark, sf)
    val plain  = li.join(o, $"l_orderkey" === $"o_orderkey").select($"l_orderkey", $"l_linenumber", $"o_totalprice")
    val salted = Relational.saltedJoin(li, o, "l_orderkey", "o_orderkey", "l_partkey", 8)
      .select($"l_orderkey", $"l_linenumber", $"o_totalprice")
    assert(salted.exceptAll(plain).count() === 0 && plain.exceptAll(salted).count() === 0)
  }

  test("topn caps group size") {
    val df = Relational.topNPerGroup(Tables.orders(spark, sf), 3)
    import spark.implicits._
    val over = df.groupBy($"o_custkey").count().filter($"count" > 3).count()
    assert(over === 0)
  }
}
