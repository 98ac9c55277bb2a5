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

  /** The bucketed-sweep variant of [[checkPairKeyCap]]: for
    * operators whose pair space is per-BUCKET quadratic
    * (ivfNearDupPairs' cells), the quadratic dimension is the
    * largest bucket's occupancy, not total keys — a degenerate
    * quantizer that drops the corpus into one cell silently reverts
    * to the full sweep. Same opt-in conf; same eager-extra-pass
    * caveat as the key cap.
    */
  def checkCellOccupancyCap(assigned: DataFrame, op: String): Unit =
    assigned.sparkSession.conf.getOption(PairSweepMaxKeys).map(_.toLong).foreach { cap =>
      import org.apache.spark.sql.functions.{count, lit, max}
      val occ = assigned.groupBy("cell").agg(count(lit(1)).as("n"))
        .agg(max("n")).collect()(0).getLong(0)
      if (occ > cap)
        throw new IllegalArgumentException(
          s"$op is O(occupancy^2) per cell and its largest cell holds $occ vectors, " +
            s"exceeding $PairSweepMaxKeys=$cap: the quantizer is not spreading the corpus " +
            s"(degenerate centroids, or nlist far too small for this corpus). Retrain with " +
            s"more cells, or raise/unset $PairSweepMaxKeys")
    }
}
