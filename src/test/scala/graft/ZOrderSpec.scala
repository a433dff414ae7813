package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational

class ZOrderSpec extends SparkSpec {

  /** Files whose [min,max] y-range intersects the predicate range —
    * the file-skipping decision parquet stats drive. */
  private def filesMatchingY(path: String, lo: Int, hi: Int): Long = {
    spark.read.parquet(path)
      .withColumn("f", input_file_name())
      .groupBy("f").agg(min("y").as("ymin"), max("y").as("ymax"))
      .filter(col("ymax") >= lo && col("ymin") <= hi)
      .count()
  }

  test("z-order layout lets the NON-leading dimension skip files") {
    import spark.implicits._
    // a full 64x64 grid: both dims comparable, no skew artifacts
    val df = spark.range(4096)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val byZ = tmpDir() + "/byz"
    val byX = tmpDir() + "/byx"
    Relational.zOrderWrite(df, byZ, "x", "y", numFiles = 8)
    df.repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(byX)
    // a selective predicate on y: the lexicographic (x-led) layout has
    // every file spanning the full y range, so nothing skips; z-order
    // files bound BOTH dims, so most files fall outside [0, 7]
    val zMatch = filesMatchingY(byZ, 0, 7)
    val xMatch = filesMatchingY(byX, 0, 7)
    assert(xMatch === 8L, s"x-sorted layout should match all files, got $xMatch")
    assert(zMatch <= 4L, s"z-order should skip most files, matched $zMatch")
    assert(spark.read.parquet(byZ).count() === 4096L)
  }

  test("string z-dim: a (date-string, id) layout prunes dirs on " +
    "both axes") {
    import spark.implicits._
    import graft.sources.TxTable
    val root = tmpDir() + "/z-str"
    // 32 day strings across two months — the varying digits sit PAST
    // byte 8 of '2026-07-XX', where a raw prefix key never looks; the
    // common-prefix-stripped key must still cluster them
    val days = (0 until 32).map(d => f"2026-${7 + d / 16}%02d-${d % 16 + 1}%02d")
    val df = (1L to 6400L).map(k => (k, days((k % 32).toInt)))
      .toDF("id", "day")
    TxTable.append(df, root)
    TxTable.optimizeZOrderN(spark, root, Seq("id", "day"), nDirs = 8)
    val all = TxTable.read(spark, root).inputFiles.length
    assert(all >= 4, s"expected a multi-dir layout, got $all files")
    // a 4-day string range on the NON-LEADING dim must skip dirs
    val rng = Map("day" -> ("2026-07-01", "2026-07-04"))
    val pruned = TxTable.read(spark, root, strRanges = rng)
      .inputFiles.length
    assert(pruned < all && pruned <= all / 2,
      s"string-dim skipping: $pruned of $all dirs survive")
    // and the leading integral dim still prunes too
    val idPruned = TxTable.read(spark, root,
      colRanges = Map("id" -> (1L, 400L))).inputFiles.length
    assert(idPruned < all, s"id-dim skipping: $idPruned of $all")
    // pruning lost nothing: range + residual filter == full filter
    val expect = df.filter($"day" >= "2026-07-01" &&
      $"day" <= "2026-07-04").count()
    val got = TxTable.read(spark, root, strRanges = rng)
      .filter($"day" >= "2026-07-01" && $"day" <= "2026-07-04").count()
    assert(got === expect)
  }

  test("zValueExpr interleaves bits exactly") {
    val r = spark.sql(
      s"SELECT ${Relational.zValueExpr("5L", "3L")} AS z").collect()(0).getLong(0)
    // x=5 (101), y=3 (011): bits x0=1,y0=1,x1=0,y1=1,x2=1,y2=0
    // z = 1*1 + 1*2 + 0*4 + 1*8 + 1*16 + 0*32 = 27
    assert(r === 27L)
  }
}
