package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Layout

/** Z-order layout: the curve's bit-level contract and the property that
  * justifies it — clustering on the curve narrows per-file min/max ranges
  * on EVERY interleaved dimension at once (what parquet footer pruning
  * needs), where a plain sort narrows only its own column.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def z(x: Long, y: Long): Long =
    Seq((x, y)).toDF("x", "y")
      .select(Layout.zValue(Seq($"x", $"y")).as("z"))
      .as[Long].head()

  test("zValue interleaves bits (corner cases + saturation)") {
    assert(z(0, 0) === 0L)
    assert(z(1, 0) === 1L) // col 0 occupies the even (low) lanes
    assert(z(0, 1) === 2L) // col 1 the odd lanes
    assert(z(3, 0) === 5L) // 0b11 -> 0b0101
    assert(z(0, 3) === 10L) // 0b11 -> 0b1010
    assert(z(65535, 65535) === (1L << 32) - 1)
    // values past 2^bits clamp to the top cell instead of wrapping to 0
    assert(z(1L << 20, 0) === z(65535, 0))
  }

  test("zValue is monotone-compatible: nearby points share high bits") {
    // the curve maps a 2^16-square quadrant to a contiguous z range: the
    // top two z bits ARE the quadrant id, so any range partitioning on z
    // automatically groups spatial quadrants
    val q = (x: Long, y: Long) => z(x, y) >>> 30
    assert(q(100, 200) === q(4000, 8000)) // both in low-low quadrant
    assert(q(40000, 200) !== q(100, 200))
    assert(q(40000, 40000) === q(60000, 50000)) // both in hi-hi quadrant
  }

  test("z-ordered files let the scan skip row groups on the SECOND dim") {
    // the end-to-end payoff: a predicate on y alone. Under an x-sort every
    // file's y range is full-width, so parquet footer stats skip nothing
    // and the scan materializes every row; under z-order most files' y
    // ranges exclude the predicate and their row groups are never read.
    val grid = (0 until 4096).map(i => ((i / 64).toLong * 1024, (i % 64).toLong * 1024))
      .toDF("x", "y")
    val zdir = TestSpark.tmpDir("graft-zp") + "/t"
    graft.ops.Layout.zOrderBy(grid, Seq($"x", $"y"), 16).write.parquet(zdir)
    val sdir = TestSpark.tmpDir("graft-sp") + "/t"
    grid.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.parquet(sdir)
    def scanRows(dir: String): Long = {
      val df = spark.read.parquet(dir).filter($"y" >= 2048 && $"y" < 6144)
      // collect() executes df's own plan, so ITS scan metrics are populated
      assert(df.collect().length === 256) // 4 of 64 y-values x 64 x-values
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
    }
    val sorted = scanRows(sdir)
    val zordered = scanRows(zdir)
    assert(sorted === 4096, s"x-sort unexpectedly skipped row groups: $sorted")
    assert(zordered <= sorted / 2,
      s"z-order skipped too little: scan read $zordered of $sorted rows")
  }

  test("compactTo merges a many-small-files table, losslessly, sized by bytes") {
    val base = TestSpark.tmpDir("graft-cmp")
    val src = s"$base/src"
    val dest = s"$base/dest"
    val df = (1 to 5000).map(i => (i.toLong, s"row-$i", i * 1.5)).toDF("id", "s", "v")
    df.repartition(64).write.parquet(src) // 64 tiny files
    def files(dir: String) =
      new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
    assert(files(src) === 64)
    // target sized so the source's total bytes fit in a handful of files
    Layout.compactTo(spark, src, dest, targetBytes = 64L << 10)
    assert(files(dest) < 8, s"still ${files(dest)} files")
    assert(spark.read.parquet(dest).orderBy("id").collect()
      === df.orderBy("id").collect())
    // compact-in-place is refused, not silently destructive
    intercept[IllegalArgumentException] {
      Layout.compactTo(spark, src, src)
    }
  }

  test("zOrderBy narrows per-file ranges on BOTH dims; a sort only on one") {
    // uniform 64x64 grid, 4096 rows
    val grid = (0 until 4096).map(i => ((i / 64).toLong * 1024, (i % 64).toLong * 1024))
      .toDF("x", "y")
    val parts = 16
    def avgRange(dir: String, c: String): Double = {
      val spans = spark.read.parquet(dir)
        .select(input_file_name().as("f"), col(c))
        .groupBy("f").agg((max(col(c)) - min(col(c))).as("span"))
        .select(avg("span")).as[Double].head()
      spans
    }
    val zdir = TestSpark.tmpDir("graft-z") + "/t"
    Layout.zOrderBy(grid, Seq($"x", $"y"), parts).write.parquet(zdir)
    val sdir = TestSpark.tmpDir("graft-s") + "/t"
    grid.repartitionByRange(parts, $"x").sortWithinPartitions($"x")
      .write.parquet(sdir)

    assert(spark.read.parquet(zdir).count() === 4096) // lossless

    val global = 63.0 * 1024
    // single-column sort: x is tight, y stays at (essentially) full width
    assert(avgRange(sdir, "x") < global / 8)
    assert(avgRange(sdir, "y") > global * 0.9)
    // z-order: BOTH dims narrow (16 files ~ 4x4 quadrants -> ~1/4 span each;
    // allow slack for range-partition boundary files straddling quadrants)
    assert(avgRange(zdir, "x") < global / 2)
    assert(avgRange(zdir, "y") < global / 2)
  }
}
