package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AsOfJoinApi, BroadcastAsOfJoinExec}

class AsOfJoinSpec extends AnyFunSuite {
  import TestSession._

  test("global as-of join matches a windowed reference on a small series") {
    import spark.implicits._
    val trades = Seq((1L, 100L, 10.0), (2L, 250L, 11.0), (3L, 50L, 9.0))
      .toDF("id", "t_us", "px").withColumn("ts", timestamp_micros($"t_us"))
    val quotes = Seq((100L, 1.0), (200L, 2.0))
      .toDF("q_us", "qv").withColumn("qts", timestamp_micros($"q_us"))
    val out = AsOfJoinApi.globalAsOfJoin(trades, quotes, "ts", "qts", "qv")
      .select($"id", $"asof_val").collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(out === Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> None))
  }

  test("broadcast guard fails fast when the right side exceeds the row cap") {
    import spark.implicits._
    spark.conf.set(BroadcastAsOfJoinExec.MaxRowsKey, "10")
    try {
      val trades = Seq((1L, 100L, 10.0)).toDF("id", "t_us", "px")
        .withColumn("ts", timestamp_micros($"t_us"))
      val quotes = spark.range(0, 100)
        .select($"id".as("q_us"), ($"id" * 1.0).as("qv"))
        .withColumn("qts", timestamp_micros($"q_us"))
      val ex = intercept[Exception] {
        AsOfJoinApi.globalAsOfJoin(trades, quotes, "ts", "qts", "qv").collect()
      }
      def causes(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(e => e +: causes(e.getCause))
      assert(causes(ex).exists(_.getMessage != null) &&
        causes(ex).exists(e => Option(e.getMessage).exists(_.contains("exceeds 10 rows"))))
    } finally spark.conf.unset(BroadcastAsOfJoinExec.MaxRowsKey)
  }
}
