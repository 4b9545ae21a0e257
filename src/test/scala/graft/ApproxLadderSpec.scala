package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measured approx-vs-exact ladder — the evidence behind every "swap the
  * approximate sketch in at 100 TB" note in this repo (winsorize,
  * madOutliers, profile): the sketches' errors on the actual fixtures,
  * asserted as bounds so a Spark upgrade that degrades a sketch fails
  * loudly. Exact results are the oracle-gated paths; the sketches are
  * what the same operators run at scale.
  */
class ApproxLadderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val events =
    Tables.load(spark, "/root/testdata/sf0.01", "events")

  test("percentile_approx converges to exact p50/p95 as accuracy rises") {
    val exact = events
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"))
      .head()
    val (e50, e95) = (exact.getDouble(0), exact.getDouble(1))
    def approxErr(acc: Int): (Double, Double) = {
      val r = events.agg(
        expr(s"percentile_approx(value, 0.5, $acc)").as("a50"),
        expr(s"percentile_approx(value, 0.95, $acc)").as("a95")).head()
      (math.abs(r.getDouble(0) - e50) / e50,
        math.abs(r.getDouble(1) - e95) / e95)
    }
    val (lo50, lo95) = approxErr(100)
    val (hi50, hi95) = approxErr(10000)
    // coarse sketch: within a few percent; fine sketch: sub-percent
    assert(lo50 < 0.05 && lo95 < 0.05,
      s"acc=100 rel err p50=$lo50 p95=$lo95")
    assert(hi50 < 0.005 && hi95 < 0.005,
      s"acc=10000 rel err p50=$hi50 p95=$hi95")
    // the ladder must not invert: more accuracy never means more error
    assert(hi50 <= lo50 + 1e-12 && hi95 <= lo95 + 1e-12)
  }

  test("approx_count_distinct stays inside its rsd envelope on real keys") {
    val cols = Seq("user_id", "event_type", "event_id")
    cols.foreach { c =>
      val exact = events.select(countDistinct(col(c))).head().getLong(0)
      // default rsd 0.05: assert 3x the standard deviation as the bound
      val approx = events.select(approx_count_distinct(col(c)))
        .head().getLong(0)
      val rel = math.abs(approx - exact).toDouble / exact
      assert(rel < 0.15, s"$c: exact=$exact approx=$approx rel=$rel")
      // tighter sketch, tighter bound
      val fine = events.select(approx_count_distinct(col(c), 0.01))
        .head().getLong(0)
      val relFine = math.abs(fine - exact).toDouble / exact
      assert(relFine < 0.03, s"$c fine: exact=$exact approx=$fine rel=$relFine")
    }
  }
}
