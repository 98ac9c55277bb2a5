package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query
  * seconds. Results are materialized through the noop sink so every
  * output column is actually computed (a bare count() would let
  * Catalyst prune the work away).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Session.local(cpus)

    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // min-of-N: a single shot conflates GC pauses / first-touch page
    // cache / JIT recompiles with the query's real cost — two rounds
    // of phantom regressions came from n=1 readings
    def materialize(name: String): Double = {
      val runs = (1 to reps).map(_ => once(name))
      if (runs.contains(-1.0)) -1.0 else runs.min
    }

    // JVM/codegen warmup on the smallest fixture so the first timed
    // query doesn't absorb session + JIT startup.
    try SparkEntry.queries("q_agg_pushdown")(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // optional comma-separated subset for local iteration
    val only    = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val names   = SparkEntry.queries.keys.toSeq.sorted.filter(n => only.forall(_.contains(n)))
    val results = names.map(n => n -> materialize(n))
    val qs      = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total   = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
