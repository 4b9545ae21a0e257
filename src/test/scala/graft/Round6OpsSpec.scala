package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Eval, Graph, Sampling, Timeseries}

/** Hand-checked laws for the round-6 additions: threshold-step PR-AUC,
  * Brier/ECE calibration summary, max-normalized HITS, the power-of-two
  * EWMA chain, and group-aware k-fold assignment. */
class Round6OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ——— averagePrecision ———————————————————————————————————————————————

  test("averagePrecision: perfect separation scores 1, reversed scores the prior tail") {
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
      .toDF("s", "p")
    val r = Eval.averagePrecision(perfect, $"s", $"p")
      .as[(Long, Long, Option[Double])].head()
    assert(r === ((2L, 2L, Some(1.0))))
    // all-negatives-above: thresholds sweep 0.9, 0.8 (no positives → ΔR
    // 0), then 0.2 → P = 1/3, then 0.1 → P = 2/4; AP = (1/2)(1/3 + 1/2)
    val reversed = Seq((0.9, false), (0.8, false), (0.2, true), (0.1, true))
      .toDF("s", "p")
    val r2 = Eval.averagePrecision(reversed, $"s", $"p")
      .as[(Long, Long, Option[Double])].head()
    assert(math.abs(r2._3.get - (0.5 * (1.0 / 3.0 + 0.5))) < 1e-6)
  }

  test("averagePrecision: a tie block contributes at its OWN threshold, not per-row") {
    // scores {0.5 ×3 (2 pos), 0.1 ×1 (1 pos)}: threshold 0.5 → ΔR = 2/3,
    // P = 2/3; threshold 0.1 → ΔR = 1/3, P = 3/4
    val df = Seq((0.5, true), (0.5, true), (0.5, false), (0.1, true))
      .toDF("s", "p")
    val r = Eval.averagePrecision(df, $"s", $"p")
      .as[(Long, Long, Option[Double])].head()
    val expected = (2.0 / 3.0) * (2.0 / 3.0) + (1.0 / 3.0) * (3.0 / 4.0)
    assert(r._1 === 3L && r._2 === 1L)
    assert(math.abs(r._3.get - expected) < 1e-6)
  }

  test("averagePrecision: no positives → null ap, counts still reported") {
    val df = Seq((0.5, false), (0.1, false)).toDF("s", "p")
    val r = Eval.averagePrecision(df, $"s", $"p")
      .as[(Long, Long, Option[Double])].head()
    assert(r === ((0L, 2L, None)))
  }

  // ——— calibrationSummary ————————————————————————————————————————————

  test("calibrationSummary: perfectly calibrated constant scorer → ece 0, brier = p(1-p)") {
    // score 0.5 everywhere, half positive: every bin has pos_rate 0.5 =
    // mean_score; brier = mean (0.5 − y)² = 0.25
    val df = (1 to 40).map(i => (i.toLong, 0.5, i % 2 == 0))
      .toDF("id", "s", "p")
    val r = Eval.calibrationSummary(df, $"id", $"s", $"p", bins = 4)
      .as[(Long, Double, Double)].head()
    assert(r._1 === 40L)
    assert(math.abs(r._2 - 0.25) < 1e-9)
    assert(r._3 === 0.0)
  }

  test("calibrationSummary: confident wrongness maximizes brier and ece") {
    // score 1.0 on all-negative rows: brier 1, every bin off by 1 → ece 1
    val df = (1 to 20).map(i => (i.toLong, 1.0, false)).toDF("id", "s", "p")
    val r = Eval.calibrationSummary(df, $"id", $"s", $"p", bins = 2)
      .as[(Long, Double, Double)].head()
    assert(r._2 === 1.0 && r._3 === 1.0)
  }

  // ——— hits ———————————————————————————————————————————————————————————

  test("hits: star graph — the hub of all spokes and the pointed-at authority max out") {
    // u1,u2,u3 → v; u1 → w. v collects 3 hubs, w collects 1.
    val edges = Seq(("u1", "v"), ("u2", "v"), ("u3", "v"), ("u1", "w"))
      .toDF("s", "d")
    val m = Graph.hits(edges, $"s", $"d", iters = 2)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // authorities: v = 1 (max), w < v; hubs: u1 (points at both) = 1
    assert(m("v")._2 === 1.0)
    assert(m("w")._2 > 0.0 && m("w")._2 < 1.0)
    assert(m("u1")._1 === 1.0)
    assert(m("u2")._1 === m("u3")._1 && m("u2")._1 < 1.0)
    // bipartite roles: sources have auth 0, sinks hub 0
    assert(m("u1")._2 === 0.0 && m("v")._1 === 0.0)
  }

  test("hits: first-round authority equals normalized in-degree of uniform hubs") {
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (3L, 11L))
      .toDF("s", "d")
    val m = Graph.hits(edges, $"s", $"d", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m(10L) === 1.0)          // in-degree 3 of 3 = max
    assert(m(11L) === 1.0 / 3.0)    // in-degree 1 / max 3
  }

  test("hits: superseded rounds release their checkpoint blocks (storage stays flat)") {
    // r6 ADVICE: hits checkpointed 4 frames/round and never unpersisted —
    // at high iters that leaks executor storage for the session's life.
    // 8 iterations must retain O(1) persisted RDDs beyond the baseline,
    // not 4·iters.
    val edges = Seq(("u1", "v"), ("u2", "v"), ("u3", "v"), ("u1", "w"))
      .toDF("s", "d")
    def persisted = spark.sparkContext.getPersistentRDDs.size
    val before = persisted
    Graph.hits(edges, $"s", $"d", iters = 8).collect()
    val retained = persisted - before
    assert(retained <= 6,
      s"hits retained $retained persisted RDDs after 8 iters (leak)")
  }

  test("hits: empty edge set yields the empty frame (the empty-delta law)") {
    val e = Seq.empty[(Long, Long)].toDF("s", "d")
    val out = Graph.hits(e, $"s", $"d", iters = 1)
    assert(out.columns.toSeq === Seq("node", "hub", "auth"))
    assert(out.count() === 0L)
  }

  // ——— ewmaDailyCounts ————————————————————————————————————————————————

  test("ewmaDailyCounts: hand-rolled chain, ramp-up normalizer, truncation at taps") {
    import java.sql.Timestamp
    def day(d: Int, n: Int): Seq[(String, Timestamp)] =
      (1 to n).map(_ => ("a", Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")))
    // counts by day: 4, 2, 8
    val events = (day(1, 4) ++ day(2, 2) ++ day(3, 8)).toDF("k", "ts")
    val out = Timeseries.ewmaDailyCounts(events, $"k", $"ts", taps = 2)
      .orderBy("day")
      .select("cnt", "n_obs", "ewma").as[(Long, Long, Double)].collect()
    // day1: 4/1; day2: (2 + 0.5·4)/1.5; day3 (truncated at 2 taps):
    // (8 + 0.5·2)/1.5
    assert(out(0) === ((4L, 1L, 4.0)))
    assert(math.abs(out(1)._3 - 4.0 / 1.5) < 1e-6 && out(1)._2 === 2L)
    assert(math.abs(out(2)._3 - 9.0 / 1.5) < 1e-6 && out(2)._2 === 2L)
  }

  test("ewmaDailyCounts: constant rate is a fixed point of the normalized chain") {
    import java.sql.Timestamp
    val events = (1 to 9).flatMap(d => (1 to 5).map(_ =>
      ("a", Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")))).toDF("k", "ts")
    val e = Timeseries.ewmaDailyCounts(events, $"k", $"ts", taps = 8)
      .orderBy("day").select("ewma").as[Double].collect()
    assert(e.forall(v => math.abs(v - 5.0) < 1e-9))
  }

  // ——— groupKFold —————————————————————————————————————————————————————

  test("groupKFold: folds in range, constant within group, deterministic, non-degenerate") {
    val df = (1 to 400).map(i => (i.toLong, s"src${i % 40}")).toDF("id", "g")
    val out = Sampling.groupKFold(df, $"g", k = 5)
    val folds = out.select("g", "fold").distinct()
      .as[(String, Long)].collect()
    assert(folds.length === 40)                      // one fold per group
    assert(folds.forall { case (_, f) => f >= 0 && f < 5 })
    assert(folds.map(_._2).distinct.length > 1)      // not all one fold
    val again = Sampling.groupKFold(df, $"g", k = 5)
      .select("g", "fold").distinct().as[(String, Long)].collect()
    assert(folds.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("groupKFold: fold assignment is stable under corpus growth") {
    val small = (1 to 100).map(i => (i.toLong, s"src${i % 10}")).toDF("id", "g")
    val big = (1 to 1000).map(i => (i.toLong, s"src${i % 100}")).toDF("id", "g")
    val fSmall = Sampling.groupKFold(small, $"g", k = 5)
      .select("g", "fold").distinct().as[(String, Long)].collect().toMap
    val fBig = Sampling.groupKFold(big, $"g", k = 5)
      .select("g", "fold").distinct().as[(String, Long)].collect().toMap
    assert(fSmall.forall { case (g, f) => fBig(g) === f })
  }
}
