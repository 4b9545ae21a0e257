package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Profile

/** The round-5 winsorize rewrite (banded exact selection, no full-stratum
  * sort — ARCHITECTURE.md round-5 audit) must be OUTPUT-IDENTICAL to the
  * order-statistic contract: threshold = the value at rank ceil(q·n) over
  * the stratum with nulls ranked first. This spec checks the clamped
  * output row-for-row against a driver-side brute-force reference on data
  * engineered for the edge cases: heavy ties (the distinct-value collapse
  * path), null prefixes long enough to swallow the lo rank, a stratum far
  * larger than the others (the banding target), singleton and all-null
  * strata, and a low `accuracy` that forces wide-bracket selection.
  */
class WinsorizeScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force expected clamp per row: sort stratum values nulls-first,
    * thresholds at ceil(q·n) (1-indexed, min rank 1), clamp skipping null
    * thresholds (greatest/least semantics).
    */
  private def expected(rows: Seq[(String, Option[Double], Long)],
                       loQ: Double, hiQ: Double): Map[Long, Option[Double]] = {
    val thrByStratum = rows.groupBy(_._1).map { case (s, rs) =>
      val vals = rs.map(_._2).sortBy(x => (x.isDefined, x.getOrElse(0.0)))
      val n = vals.size
      def thr(q: Double): Option[Double] =
        vals(math.max(math.ceil(q * n).toLong, 1L).toInt - 1)
      s -> (thr(loQ), thr(hiQ))
    }
    rows.map { case (s, v, id) =>
      val (lo, hi) = thrByStratum(s)
      // Spark's greatest/least SKIP nulls: greatest(null, lo) = lo, so a
      // null-value row clamps to the thresholds themselves
      val afterLo = (v, lo) match {
        case (Some(x), Some(l)) => Some(math.max(x, l))
        case (None, l) => l
        case (x, None) => x
      }
      val clamped = (afterLo, hi) match {
        case (Some(x), Some(h)) => Some(math.min(x, h))
        case (None, h) => h
        case (x, None) => x
      }
      id -> clamped
    }.toMap
  }

  private def check(rows: Seq[(String, Option[Double], Long)],
                    loQ: Double, hiQ: Double, accuracy: Int = 10000): Unit = {
    val df = rows.toDF("s", "v", "id")
    val got = Profile.winsorize(df, col("s"), col("v"), col("id"),
        loQ, hiQ, accuracy)
      .select(col("id"), col("clamped"))
      .as[(Long, Option[Double])].collect().toMap
    val want = expected(rows, loQ, hiQ)
    assert(got.size === rows.size)
    val diffs = want.collect { case (id, w) if got(id) != w => (id, w, got(id)) }
    assert(diffs.isEmpty, s"clamp mismatches (id, want, got): ${diffs.take(5)}")
  }

  private val rnd = new scala.util.Random(55)

  test("banded selection == brute force on a skewed, tied, nulled mixture") {
    var id = 0L
    val rows =
      // mega-stratum: 20k rows from a small tied grid (distinct collapse)
      Seq.fill(20000) { id += 1; ("big", Some((rnd.nextInt(500) / 7).toDouble), id) } ++
      // continuous stratum, no ties
      Seq.fill(2000) { id += 1; ("cont", Some(rnd.nextGaussian() * 100), id) } ++
      // null-heavy: 30% nulls — lo rank falls inside the null prefix
      Seq.fill(1000) { id += 1
        ("nully", if (rnd.nextInt(10) < 3) None else Some(rnd.nextDouble()), id) } ++
      // tiny strata: singleton, pair, all-null
      Seq(("one", Some(7.0), { id += 1; id }),
        ("pair", Some(1.0), { id += 1; id }),
        ("pair", Some(2.0), { id += 1; id }),
        ("allnull", None, { id += 1; id }),
        ("allnull", None, { id += 1; id }))
    check(rows, 0.05, 0.95)
    check(rows, 0.25, 0.75)
    // boundary quantiles: q=0 hits the rank-1 floor, q=1 the max
    check(rows, 0.0, 1.0)
  }

  test("low accuracy still selects exactly (wider band, same statistic)") {
    var id = 0L
    val rows = Seq.fill(5000) { id += 1
      ("s" + rnd.nextInt(3), Some(rnd.nextInt(100).toDouble), id) }
    check(rows, 0.05, 0.95, accuracy = 100)
  }

  test("string values take the legacy path and still clamp lexicographically") {
    val df = Seq(("a", "apple", 1L), ("a", "pear", 2L), ("a", "zebra", 3L),
      ("a", "mango", 4L)).toDF("s", "v", "id")
    val got = Profile.winsorize(df, col("s"), col("v"), col("id"),
        0.26, 0.76)
      .select(col("id"), col("clamped")).as[(Long, String)].collect().toMap
    // sorted: apple mango pear zebra; lo rank ceil(.26*4)=2 -> mango,
    // hi rank ceil(.76*4)=4 -> zebra
    assert(got === Map(1L -> "mango", 2L -> "pear", 3L -> "zebra", 4L -> "mango"))
  }

  test("plan: threshold search has no full-stratum row_number window") {
    val df = Seq(("a", 1.0, 1L)).toDF("s", "v", "id")
    val plan = Profile.winsorize(df, col("s"), col("v"), col("id"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("row_number"),
      s"banded winsorize regained a rank window:\n$plan")
    assert(plan.contains("percentile_approx"),
      s"banded winsorize lost its pivot sketch:\n$plan")
  }
}
