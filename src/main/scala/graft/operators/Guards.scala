package graft.operators

import org.apache.spark.sql.DataFrame

/** Opt-in fail-loudly guards for operators whose cost model makes a
  * misrouted input expensive instead of wrong — the same convention
  * as EmaAggregate's buffer cap and emaStream's maxKeys: declared
  * semantics stay available, but a configurable ceiling turns a
  * surprise O(n²) job into an immediate, named error.
  */
object Guards {

  /** Session conf capping the key cardinality of the quadratic-by-
    * design pair sweeps (correlationMatrix, cosineNearDupPairs).
    * Unset (the default) leaves the contract documented but
    * unenforced, matching the other graft guards.
    */
  val PairSweepMaxKeys = "graft.pairSweep.maxKeys"

  /** Enforce the pair-sweep key cap on the operator's already-built
    * per-key frame (one row per key, so the count IS the pair-space
    * root). Runs only when the conf is set, and then it EAGERLY
    * executes the per-key frame's plan once more at operator-build
    * time: the limit bounds the rows returned, not the upstream
    * aggregation work (a groupBy cannot be pruned by a limit), so
    * enabling the cap costs one extra pass over the operator's
    * pre-pair phase — noise next to the O(keys²) sweep it guards,
    * but a laziness change callers should know about.
    */
  def checkPairKeyCap(perKey: DataFrame, op: String): Unit =
    perKey.sparkSession.conf.getOption(PairSweepMaxKeys).map(_.toLong).foreach { cap =>
      require(cap <= Int.MaxValue - 1, s"$PairSweepMaxKeys must fit an Int limit")
      val n = perKey.limit(cap.toInt + 1).count()
      if (n > cap)
        throw new IllegalArgumentException(
          s"$op is O(keys^2) by declared semantics and its key universe holds >$cap keys " +
            s"(counted >= $n): this looks like an open-ended key stream routed into a bounded-" +
            s"panel operator. Use the LSH/banded candidate paths for unbounded universes, or " +
            s"raise/unset $PairSweepMaxKeys")
    }
}
