package graft

import org.apache.spark.sql.functions._
import graft.operators.Olap

/** Round-11 additions: CUSUM changepoint detection via the
  * parallel-prefix closed form. */
class Round11Spec extends SparkSpec {

  test("cusum: closed form equals the sequential recursion, alarms consistent") {
    val rows = Olap.cusum(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val ordered = g.sortBy(_._2)
      val xs = ordered.map(_._3)
      val n = xs.length.toLong
      val tgt = xs.sum / n // Scala / == Spark div on positive sums
      // replay the textbook recursion s_i = max(0, s_{i-1} + d_i)
      var s = 0L
      ordered.foreach { case (_, day, x, cusum, _) =>
        s = math.max(0L, s + (x - tgt))
        assert(cusum === s, s"closed form diverges at $day: $cusum != $s")
      }
      // alarm column is exactly the threshold comparison
      val h = 3L * xs.map(x => math.abs(x - tgt)).sum / n
      ordered.foreach { case (_, day, _, cusum, alarm) =>
        assert(alarm === (cusum > h), s"alarm mismatch at $day")
      }
      // cusum is never negative
      assert(ordered.forall(_._4 >= 0L))
    }
  }
}
