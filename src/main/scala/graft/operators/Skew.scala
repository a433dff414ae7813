package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB joins.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) handles most cases at runtime; `saltedJoin` is the static
  * fallback for when one side has pathological hot keys AND the other
  * side is too big to broadcast: the hot side spreads each key over
  * `salt` shuffle partitions, the other side replicates each row
  * `salt` times — turning one straggler partition into `salt`
  * even ones.
  */
object Skew {

  /** Inner equi-join with the left side salted over `salt` buckets.
    * Deterministic salt from the row content keeps the operator
    * reproducible (no rand()). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
    salt: Int = 8): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(hash(struct(left.columns.map(col).toSeq: _*)), lit(salt)))
    val replicated = right
      .withColumn("_salt", explode(expr(s"sequence(0, ${salt - 1})")))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Top-n heavy keys of a column — the probe used to decide whether a
    * key needs salting (runs as one partial-agg pass, not a collect of
    * the raw data). */
  def heavyHitters(df: DataFrame, key: Column, n: Int = 10): DataFrame =
    df.groupBy(key).count().orderBy(col("count").desc).limit(n)
}
