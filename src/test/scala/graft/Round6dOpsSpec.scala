package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Graph, Similarity, Timeseries}

/** Hand-checked laws for the round-6 batch-D operators: MMR greedy
  * diversification, multi-source BFS layers, the weekly seasonal
  * profile, and CUSUM change-point detection. */
class Round6dOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ——— mmrDiversify ——————————————————————————————————————————————————

  test("mmrDiversify: diversity beats raw relevance once a near-dup is picked") {
    // query q: items 1 and 2 are near-identical (same axis) with rel .95
    // and .94; item 3 is orthogonal with rel .5. Pure relevance ranks
    // (1, 2, 3); MMR at λ=.5 must pick 1, then 3 (2's similarity to 1
    // wipes its margin), then 2.
    val ax0 = Array(1.0f, 0.0f)
    val ax1 = Array(0.0f, 1.0f)
    val sl = Seq(
      (7L, 1L, 0.95, ax0), (7L, 2L, 0.94, ax0), (7L, 3L, 0.5, ax1))
      .toDF("query_id", "item_id", "rel", "vec")
    val out = Similarity.mmrDiversify(sl, k = 3, lambda = 0.5)
      .orderBy("rank").select("item_id").as[Long].collect().toSeq
    assert(out === Seq(1L, 3L, 2L))
  }

  test("mmrDiversify: step scores are λ·rel − (1−λ)·max-sim, rounded rdz") {
    val ax0 = Array(1.0f, 0.0f)
    val sl = Seq((7L, 1L, 0.9, ax0), (7L, 2L, 0.8, ax0))
      .toDF("query_id", "item_id", "rel", "vec")
    val out = Similarity.mmrDiversify(sl, k = 2, lambda = 0.5)
      .orderBy("rank").select("score").as[Double].collect()
    assert(out(0) === 0.45) // 0.5·0.9 − 0
    // step 2: 0.5·0.8 − 0.5·cos(ax0, ax0) = 0.4 − 0.5 = −0.1
    assert(out(1) === -0.1)
  }

  test("mmrDiversify: queries are independent (per-query windows)") {
    val ax = Array(1.0f, 0.0f)
    val sl = Seq((1L, 10L, 0.9, ax), (2L, 20L, 0.8, ax))
      .toDF("query_id", "item_id", "rel", "vec")
    val out = Similarity.mmrDiversify(sl, k = 1, lambda = 0.5)
      .select("query_id", "item_id").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 10L), (2L, 20L)))
  }

  // ——— bfsDistances ——————————————————————————————————————————————————

  test("bfsDistances: layers on a path, cap honored, unreachable absent") {
    // path 1→2→3→4→5→6, seed {1}, maxDepth 3: dists 0..3, {5, 6} absent
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("s", "d")
    val seeds = Seq(1L).toDF("n")
    val out = Graph.bfsDistances(e, $"s", $"d", seeds, $"n", maxDepth = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L)))
  }

  test("bfsDistances: multi-source takes the NEAREST seed; cycles terminate") {
    // cycle 1→2→3→1 with seeds {1, 3}: dist(2) = 1 via 1, not 2 via 3
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val seeds = Seq(1L, 3L).toDF("n")
    val out = Graph.bfsDistances(e, $"s", $"d", seeds, $"n", maxDepth = 10)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 0L), (2L, 1L), (3L, 0L)))
  }

  // ——— seasonalProfile ———————————————————————————————————————————————

  test("seasonalProfile: dow numbering is Sunday=0 and shares sum to 1") {
    // 2024-01-07 is a Sunday; two Sundays (3 + 1 events), one Monday (2)
    def t(s: String) = Timestamp.valueOf(s + " 12:00:00")
    val ev = (Seq.fill(3)(("a", t("2024-01-07"))) ++
      Seq.fill(1)(("a", t("2024-01-14"))) ++
      Seq.fill(2)(("a", t("2024-01-08")))).toDF("k", "ts")
    val out = Timeseries.seasonalProfile(ev, $"k", $"ts")
      .orderBy("dow")
      .select("dow", "n_days", "n_events", "mean_daily", "share")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3, r._4)) ===
      Seq((0L, 2L, 4L, 2.0), (1L, 1L, 2L, 2.0)))
    assert(math.abs(out(0)._5 - 4.0 / 6.0) < 1e-6)
    assert(math.abs(out(1)._5 - 2.0 / 6.0) < 1e-6)
  }

  // ——— changePoint ———————————————————————————————————————————————————

  test("changePoint: a level shift is located at the last day of the old regime") {
    // key a: days 1-5 at 10/day, days 6-10 at 100/day — max |S_k − k·S_n/n|
    // lands at k=5 (the regime boundary)
    def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    val ev = ((1 to 5).map(d => ("a", t(d), 10.0)) ++
      (6 to 10).map(d => ("a", t(d), 100.0))).toDF("k", "ts", "v")
    val out = Timeseries.changePoint(ev, $"k", $"ts", $"v")
      .select("change_day", "n_days").as[(java.sql.Date, Long)].head()
    assert(out._1.toString === "2024-01-05" && out._2 === 10L)
  }

  test("seasonalAnomalies: a spike flags against ITS day-of-week baseline only") {
    def t(d: Int, n: Int) = (1 to n).map(_ =>
      ("a", Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")))
    // Sundays 7/14 at 10 and 30 (mean 20); Monday 8 at 25 (its own mean)
    val ev = (t(7, 10) ++ t(14, 30) ++ t(8, 25)).toDF("k", "ts")
    val profile = Timeseries.seasonalProfile(ev, $"k", $"ts")
    val daily = Timeseries.dailyCounts(ev, $"k", $"ts")
    val out = Timeseries.seasonalAnomalies(daily, profile, factor = 1.2)
      .select("day", "cnt").as[(String, Long)].collect().toSeq
    // only the 30-count Sunday exceeds 1.2×20; Monday 25 IS its baseline
    assert(out === Seq(("2024-01-14", 30L)))
  }

  test("changePoint: constant series has stat 0 and earliest-day tie-break") {
    def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    val ev = (1 to 6).map(d => ("a", t(d), 5.0)).toDF("k", "ts", "v")
    val out = Timeseries.changePoint(ev, $"k", $"ts", $"v")
      .select("change_day", "stat").as[(java.sql.Date, Double)].head()
    assert(out._1.toString === "2024-01-01" && out._2 === 0.0)
  }
}
