package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the IEEE negative-zero normalization of [[Readout.rdz]] — the fix
  * for round-5's q162 red row, where DuckDB's `round(-1e-8, 6)` emitted
  * −0.0 (sign bit kept) while Spark's BigDecimal-backed `round` emitted
  * +0.0 and the driver's bit-pattern hash split. The oracle-side twin
  * (`round(x, k) + 0.0`) is pinned by the DuckDB self-test at the top of
  * `tools/check.py:main` — both must map −1e-9 → +0.0 with a clear sign
  * bit.
  */
class RoundReadoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bitsOf(v: Double): Long = java.lang.Double.doubleToRawLongBits(v)

  test("rdz maps tiny negatives to +0.0, bit-identically to literal zero") {
    val out = Seq(-1e-9, -4.9e-7, -0.0, 0.0, 1e-9).toDF("v")
      .select(Readout.rdz(col("v"), 6).as("r"))
      .as[Double].collect()
    out.foreach { r =>
      assert(bitsOf(r) === bitsOf(0.0), s"expected +0.0 bits, got $r")
    }
  }

  test("rdz is bit-identical to round away from the zero boundary") {
    val vals = Seq(-1.234567891, -0.005, -5e-7, 0.015, 3.999999949, 123.456)
    val rounded = vals.toDF("v").select(round(col("v"), 6).as("r"))
      .as[Double].collect()
    val normalized = vals.toDF("v").select(Readout.rdz(col("v"), 6).as("r"))
      .as[Double].collect()
    rounded.zip(normalized).foreach { case (a, b) =>
      assert(bitsOf(a) === bitsOf(b), s"rdz changed a nonzero readout: $a vs $b")
    }
  }

  test("rdz preserves null") {
    val out = Seq[Option[Double]](None).toDF("v")
      .select(Readout.rdz(col("v"), 6).as("r"))
      .collect()
    assert(out.head.isNullAt(0))
  }
}
