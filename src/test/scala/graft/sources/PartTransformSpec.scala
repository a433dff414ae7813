package graft.sources

import org.apache.spark.sql.connector.expressions.Expressions
import org.scalatest.funsuite.AnyFunSuite

/** The two faces of partition-transform handling: CREATE/write-time
  * validation is STRICT (an unsupported layout must never be
  * declared), load-time resolution is LENIENT (a pre-existing table
  * declared with `bucket(16, c)` must stay readable — before round 16
  * the strict check ran on every loadTable and such a table could not
  * even be SELECTed). */
class PartTransformSpec extends AnyFunSuite {

  test("strict face: identity passes, bucket/days refuse") {
    assert(TxTableSource.identityPartCols(
      Seq(Expressions.identity("region"), Expressions.identity("d"))) ===
      Seq("region", "d"))
    intercept[UnsupportedOperationException] {
      TxTableSource.identityPartCols(Seq(Expressions.bucket(16, "k")))
    }
    intercept[UnsupportedOperationException] {
      TxTableSource.identityPartCols(Seq(Expressions.days("ts")))
    }
  }

  test("lenient face: unsupported transforms are ignored, identity " +
    "columns survive — the table stays loadable") {
    assert(TxTableSource.identityPartColsLenient(
      Seq(Expressions.identity("region"), Expressions.bucket(16, "k"),
        Expressions.days("ts"))) === Seq("region"))
    assert(TxTableSource.identityPartColsLenient(
      Seq(Expressions.bucket(16, "k"))) === Seq.empty)
  }
}
