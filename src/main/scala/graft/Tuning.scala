package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Plan-statistics-driven tuning probes — the automated version of
  * the per-job configuration knobs the reference's operators set by
  * hand (io.sort.mb, map counts, join strategy via job setup).
  */
object Tuning {

  /** Broadcast the dimension side of a join iff Catalyst's own size
    * estimate says it fits, independent of the session-wide
    * autoBroadcastJoinThreshold (which a shared cluster often pins
    * low or off). Reads the optimized plan's statistics — file sizes
    * after partition pruning, not a guess — so the decision tracks
    * filters: `part.filter(p_size > 45)` broadcasts when the filtered
    * estimate fits even if the full table would not. */
  def autoBroadcast(dim: DataFrame, thresholdBytes: Long = 32L << 20): DataFrame = {
    val estimate = dim.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estimate <= thresholdBytes) broadcast(dim) else dim
  }
}
