package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Funnel, TextAnalysis, Timeseries}

/** Behavioral-analytics + time-series operators: cohort retention,
  * transition matrix, daily resample with forward fill, and document-level
  * BM25 search.
  */
class BehaviorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cohortRetention: offset 0 is the full cohort, later offsets shrink") {
    // 2024-01-01 and 2024-01-08 are both Mondays.
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), // cohort W1
      (2L, ts("2024-01-02 10:00:00")), // cohort W1
      (1L, ts("2024-01-08 10:00:00")), // W1 user active in W2
      (3L, ts("2024-01-09 10:00:00"))  // cohort W2
    ).toDF("user_id", "ts")
    val out = Funnel.cohortRetention(ev, $"user_id", $"ts")
      .orderBy("cohort_week", "week_offset").collect()
    assert(out.map(r => (r.getAs[Date]("cohort_week").toString,
      r.getAs[Long]("week_offset"), r.getAs[Long]("n_active"),
      r.getAs[Long]("cohort_size"))).toSeq === Seq(
      ("2024-01-01", 0L, 2L, 2L),
      ("2024-01-01", 1L, 1L, 2L),
      ("2024-01-08", 0L, 1L, 1L)))
    // offset-0 retention is exactly 1.0; the week-2 cell is exactly 0.5
    val ret = out.map(r => r.getAs[Double]("retention"))
    assert(ret(0) === 1.0 && ret(1) === 0.5 && ret(2) === 1.0)
  }

  test("transitions: counts consecutive pairs per user, probabilities row-normalize") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:01"), 1L, "view"),
      (1L, ts("2024-01-01 00:00:02"), 2L, "click"),
      (1L, ts("2024-01-01 00:00:03"), 3L, "view"),
      (1L, ts("2024-01-01 00:00:04"), 4L, "click"),
      (2L, ts("2024-01-01 00:00:01"), 5L, "view"),
      (2L, ts("2024-01-01 00:00:02"), 6L, "buy")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Funnel.transitions(ev, $"user_id", $"event_type",
        Seq($"ts", $"event_id"))
      .orderBy("from_type", "to_type")
      .select("from_type", "to_type", "n", "p")
      .as[(String, String, Long, Double)].collect().toSeq
    // user 1: view→click, click→view, view→click; user 2: view→buy
    assert(out === Seq(
      ("click", "view", 1L, 1.0),
      ("view", "buy", 1L, 0.3333),
      ("view", "click", 2L, 0.6667)))
    // no cross-user pair leaked (user 1 ends click, user 2 starts view)
    assert(!out.exists(r => r._1 == "click" && r._2 == "buy"))
  }

  test("resampleDailyFfill: gap days synthesized, value carried forward") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5.0),
      (1L, ts("2024-01-01 11:00:00"), 3.0),
      (1L, ts("2024-01-04 10:00:00"), 7.0), // 2-day gap before this
      (2L, ts("2024-02-01 10:00:00"), 1.0)  // single-day span
    ).toDF("user_id", "ts", "value")
    val out = Timeseries.resampleDailyFfill(ev, $"user_id", $"ts", $"value")
      .orderBy("key", "day")
      .select($"key", $"day".cast("string"), $"n_events", $"value_ffill",
        $"is_gap")
      .as[(Long, String, Long, Double, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, "2024-01-01", 2L, 5.0, false),
      (1L, "2024-01-02", 0L, 5.0, true),  // gap: last daily max carried
      (1L, "2024-01-03", 0L, 5.0, true),
      (1L, "2024-01-04", 1L, 7.0, false),
      (2L, "2024-02-01", 1L, 1.0, false)))
  }

  test("rollingDailyCounts: window spans gap days, short at span start") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 11:00:00"), 1.0),
      (1L, ts("2024-01-03 10:00:00"), 1.0) // day 2 is a gap
    ).toDF("user_id", "ts", "value")
    val out = Timeseries.rollingDailyCounts(ev, $"user_id", $"ts",
        windowDays = 2)
      .orderBy("day")
      .select($"day".cast("string"), $"n_window", $"days_in_window",
        $"avg_daily")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("2024-01-01", 2L, 1L, 2.0),   // first day: window has 1 day only
      ("2024-01-02", 2L, 2L, 1.0),   // gap day still advances the window
      ("2024-01-03", 1L, 2L, 0.5))) // gap day contributes 0 to the sum
  }

  test("topKList: rank-ordered, tie-broken, capped at k") {
    val df = Seq(
      ("a", "x", 101L, 5L), ("a", "x", 102L, 9L), ("a", "x", 103L, 9L),
      ("a", "x", 104L, 1L), ("a", "x", 105L, 7L),
      ("b", "y", 201L, 3L)
    ).toDF("g1", "g2", "id", "score")
    val out = graft.ops.Profile.topKList(df, Seq($"g1", $"g2"), $"id",
        $"score", k = 3)
      .orderBy("__g0", "__g1")
      .select("__g0", "__g1", "n_items", "top_items")
      .as[(String, String, Long, String)].collect().toSeq
    // 9-tie broken by item string asc (102 < 103), then 7; 5 and 1 cut
    assert(out === Seq(("a", "x", 3L, "102,103,105"), ("b", "y", 1L, "201")))
  }

  test("slidingWindowAgg: each event lands in width/slide windows, sums exact") {
    val ev = Seq(
      (ts("2024-01-01 10:30:00"), "view", 1.5),
      (ts("2024-01-01 10:45:00"), "view", 2.5),
      (ts("2024-01-01 11:30:00"), "view", 4.0)
    ).toDF("ts", "event_type", "value")
    val out = Timeseries.slidingWindowAgg(ev, $"ts", $"event_type",
        $"value", widthSec = 7200L, slideSec = 3600L)
      .orderBy("window_start")
      .select(date_format($"window_start", "HH:mm").as("w"), $"n_events",
        $"sum_value")
      .as[(String, Long, Double)].collect().toSeq
    // 10:30/10:45 fall in [09,11) and [10,12); 11:30 in [10,12) and [11,13)
    assert(out === Seq(
      ("09:00", 2L, 4.0), ("10:00", 3L, 8.0), ("11:00", 1L, 4.0)))
  }

  test("outlierDays: spike day flagged, uniform and single-day keys never") {
    val base = (1 to 10).map(d =>
      (1L, ts(f"2024-01-$d%02d 10:00:00"), 10.0))
    val spike = Seq((1L, ts("2024-01-11 10:00:00"), 500.0),
      (2L, ts("2024-01-01 10:00:00"), 999.0)) // single-day key: var 0
    val out = Timeseries.outlierDays(
        (base ++ spike).toDF("user_id", "ts", "value"),
        $"user_id", $"ts", $"value")
      .select($"key", $"day".cast("string"), $"day_sum")
      .as[(Long, String, Double)].collect().toSeq
    assert(out === Seq((1L, "2024-01-11", 500.0)))
  }

  test("timeWeightedAvg: duration-weighted, last value holds to end of day") {
    // value 10 for 6h (00:00→06:00), then 20 for the remaining 18h:
    // twap = (10*6 + 20*18) / 24 = 17.5
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 06:00:00"), 2L, 20.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Timeseries.timeWeightedAvg(ev, $"user_id", $"ts", $"value",
        Seq($"ts", $"event_id"))
      .select($"key", $"day".cast("string"), $"n_events", $"twap")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(out === Seq((1L, "2024-01-01", 2L, 17.5)))
    // a single observation is the whole day's average, exactly
    val one = Seq((2L, ts("2024-03-05 23:59:00"), 9L, 7.25))
      .toDF("user_id", "ts", "event_id", "value")
    val o = Timeseries.timeWeightedAvg(one, $"user_id", $"ts", $"value",
      Seq($"ts", $"event_id")).select("twap").as[Double].collect()
    assert(o.toSeq === Seq(7.25))
  }

  test("gapHistogram: whole-minute buckets, tail capped, per-key only") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 00:00:30"), 2L),  // 0-minute gap
      (1L, ts("2024-01-01 00:02:00"), 3L),  // 1-minute gap (90s)
      (1L, ts("2024-01-01 09:00:00"), 4L),  // capped to 60
      (2L, ts("2024-01-01 00:05:00"), 5L)   // new key: no gap counted
    ).toDF("user_id", "ts", "event_id")
    val out = Timeseries.gapHistogram(ev, $"user_id", $"ts",
        Seq($"ts", $"event_id"), capMinutes = 60)
      .orderBy("gap_minutes")
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((0L, 1L), (1L, 1L), (60L, 1L)))
  }

  test("giniIndex: 0 for uniform, near-1 for concentrated, null for zero mass") {
    val df = Seq(
      ("u", 1L, 10L), ("u", 2L, 10L), ("u", 3L, 10L), ("u", 4L, 10L),
      ("c", 1L, 0L), ("c", 2L, 0L), ("c", 3L, 0L), ("c", 4L, 1000L),
      ("z", 1L, 0L), ("z", 2L, 0L)
    ).toDF("source", "doc_id", "n_chars")
    val out = graft.ops.Profile.giniIndex(df, $"source", $"n_chars",
        $"doc_id")
      .orderBy("__g").collect()
    val byG = out.map(r => r.getString(0) ->
      (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(byG("u") === Some(0.0))
    // one holder of all mass among 4: G = (2*4*1000 - 5*1000)/(4*1000) = 0.75
    assert(byG("c") === Some(0.75))
    assert(byG("z") === None) // zero total mass: undefined, not a crash
  }

  test("coOccurrence: pair counts, supports and lift; support filter bites") {
    val df = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L),
      (4L, 30L), (4L, 40L), // (30,40) support 1: filtered at minSupport=2
      (5L, 50L)             // singleton basket: no pairs
    ).toDF("basket", "item")
    val out = Funnel.coOccurrence(df, $"basket", $"item", minSupport = 2L)
      .select("item_a", "item_b", "n_ab", "n_a", "n_b", "lift")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    // only (10,20): together 3×, each in 3 baskets of 5 → lift 3*5/(3*3)
    assert(out === Seq((10L, 20L, 3L, 3L, 3L, 5.0 / 3.0)))
    // duplicate (basket, item) rows must not inflate counts
    val dup = Funnel.coOccurrence(
      df.union(Seq((1L, 10L)).toDF("basket", "item")),
      $"basket", $"item", minSupport = 2L)
      .select("n_ab").as[Long].collect().toSeq
    assert(dup === Seq(3L))
  }

  test("empty-input law: every behavior/timeseries operator yields empty, not a crash") {
    val ev = spark.emptyDataset[(Long, Timestamp, Long, String, Double)]
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val docs = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    assert(Funnel.cohortRetention(ev, $"user_id", $"ts").count() === 0L)
    assert(Funnel.transitions(ev, $"user_id", $"event_type",
      Seq($"ts", $"event_id")).count() === 0L)
    assert(Funnel.coOccurrence(ev, $"user_id", $"event_id").count() === 0L)
    assert(Timeseries.resampleDailyFfill(ev, $"user_id", $"ts",
      $"value").count() === 0L)
    assert(Timeseries.rollingDailyCounts(ev, $"user_id", $"ts",
      windowDays = 7).count() === 0L)
    assert(Timeseries.slidingWindowAgg(ev, $"ts", $"event_type", $"value",
      7200L, 3600L).count() === 0L)
    assert(Timeseries.outlierDays(ev, $"user_id", $"ts",
      $"value").count() === 0L)
    assert(Timeseries.timeWeightedAvg(ev, $"user_id", $"ts", $"value",
      Seq($"ts", $"event_id")).count() === 0L)
    assert(Timeseries.gapHistogram(ev, $"user_id", $"ts",
      Seq($"ts", $"event_id")).count() === 0L)
    assert(graft.ops.Profile.giniIndex(
      docs.withColumn("n_chars", length($"text")), $"text", $"n_chars",
      $"doc_id").count() === 0L)
    assert(graft.ops.Profile.topKList(docs, Seq($"doc_id"), $"text",
      $"doc_id", k = 3).count() === 0L)
    assert(TextAnalysis.bm25Search(docs, $"doc_id", $"text",
      Seq("data"), k = 5).count() === 0L)
  }

  test("knnGraph: symmetric edges, rank order, block isolation") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), "x"),
      (2L, Array(0.9f, 0.1f), "x"),  // closest to 1
      (3L, Array(0.0f, 1.0f), "x"),  // orthogonal to 1
      (4L, Array(1.0f, 0.0f), "y")   // other block: invisible to 1-3
    ).toDF("vec_id", "embedding", "label")
    val g = graft.ops.Similarity.knnGraph(vecs, $"vec_id", $"embedding",
        Seq($"label"), k = 2)
      .select("node", "rank", "nbr").as[(Long, Long, Long)].collect().toSeq
    // node 1's nearest is 2; the edge appears from both endpoints
    assert(g.contains((1L, 1L, 2L)) && g.contains((2L, 1L, 1L)))
    // block isolation: 4 has no in-block partner, so no rows at all
    assert(!g.exists(r => r._1 == 4L || r._3 == 4L))
    // every node's ranks are 1..deg with no gaps
    g.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted === (1L to rows.length.toLong))
    }
  }

  test("neighborMeanFeatures: exact per-dim mean of the k nearest only") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), "x"),
      (2L, Array(0.8f, 0.2f), "x"),
      (3L, Array(0.6f, 0.4f), "x")
    ).toDF("vec_id", "embedding", "label")
    val out = graft.ops.Similarity.neighborMeanFeatures(vecs, $"vec_id",
        $"embedding", Seq($"label"), k = 2, dims = 2)
      .orderBy("node", "dim")
      .select("node", "dim", "n_nbrs", "mean_v")
      .as[(Long, Int, Long, Double)].collect().toSeq
    // node 1's two neighbors are 2 and 3: dim1 mean = (0.8+0.6)/2
    val n1 = out.filter(_._1 == 1L)
    assert(n1.map(_._3).forall(_ == 2L))
    assert(math.abs(n1.head._4 - (0.8f.toDouble + 0.6f.toDouble) / 2) < 1e-9)
    // every node has exactly `dims` rows
    assert(out.groupBy(_._1).forall(_._2.length === 2))
  }

  test("knnGraphIncremental: merge law — incremental equals full recompute") {
    val mk = (rows: Seq[(Long, Array[Float], String)]) =>
      rows.toDF("vec_id", "embedding", "label")
    val corpus = mk(Seq(
      (10L, Array(1.0f, 0.0f, 0.0f), "x"),
      (11L, Array(0.9f, 0.1f, 0.0f), "x"),
      (12L, Array(0.0f, 1.0f, 0.0f), "x"),
      (13L, Array(0.0f, 0.9f, 0.1f), "x")))
    // the batch vector displaces corpus nodes' existing neighbors
    val batch = mk(Seq((1L, Array(1.0f, 0.05f, 0.0f), "x"),
      (2L, Array(0.0f, 0.0f, 1.0f), "y"))) // new block: batch-only node
    val existing = graft.ops.Similarity.knnGraph(corpus, $"vec_id",
      $"embedding", Seq($"label"), k = 2)
    val inc = graft.ops.Similarity.knnGraphIncremental(existing, corpus,
        batch, $"vec_id", $"embedding", Seq($"label"), k = 2)
      .select("node", "rank", "nbr").as[(Long, Long, Long)]
      .collect().toSet
    val full = graft.ops.Similarity.knnGraph(corpus.union(batch),
        $"vec_id", $"embedding", Seq($"label"), k = 2)
      .select("node", "rank", "nbr").as[(Long, Long, Long)]
      .collect().toSet
    assert(inc === full)
    // and the batch genuinely changed the graph (the law isn't vacuous)
    val before = existing.select("node", "rank", "nbr")
      .as[(Long, Long, Long)].collect().toSet
    assert(before !== full)
  }

  test("labelPropagation: star collapses to hub label, isolated edge keeps pair") {
    // star: 1 -> {2,3,4} and back; separate pair 8 <-> 9
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (1L, 4L),
      (4L, 1L), (8L, 9L), (9L, 8L))
      .toDF("s", "d").select($"s".cast("string").as("s"),
        $"d".cast("string").as("d"))
    // Synchronous LPA on a star oscillates (the known sync-update
    // behavior): round 1 the leaves adopt the hub's "1" while the hub
    // simultaneously adopts min(leaf labels) = "2"; round 2 swaps back.
    val r1 = graft.ops.Graph.labelPropagation(edges, $"s", $"d", iters = 1)
      .as[(String, String)].collect().toMap
    assert(r1("2") === "1" && r1("3") === "1" && r1("4") === "1")
    assert(r1("1") === "2")
    val out = graft.ops.Graph.labelPropagation(edges, $"s", $"d", iters = 2)
      .as[(String, String)].collect().toMap
    assert(out("1") === "1" &&
      out("2") === "2" && out("3") === "2" && out("4") === "2")
    // the pair trades labels each round: after 2 rounds each is back home
    assert(out("8") === "8" && out("9") === "9")
    // zero iterations = identity labeling
    val id0 = graft.ops.Graph.labelPropagation(edges, $"s", $"d", iters = 0)
      .as[(String, String)].collect()
    assert(id0.forall(r => r._1 === r._2))
  }

  test("labelPropagation stopOnFixpoint: early stop on a converged DAG") {
    // 1 -> {2,3} with no back edges: round 1 relabels the leaves to "1",
    // round 2 changes nothing — the fixpoint. With the stop enabled a
    // generous cap must return the SAME labels as the exact 2-round
    // unroll (i.e. the cap was not run out: round 50's output of an
    // oscillating graph would differ, and a non-stopping loop on this
    // graph is the identity from round 2 anyway — equality to the
    // 2-round unroll plus wall-clock sanity is the observable).
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("s", "d")
    val fixed = graft.ops.Graph.labelPropagation(edges, $"s", $"d", iters = 2)
      .as[(Long, Long)].collect().toSet
    val stopped = graft.ops.Graph.labelPropagation(edges, $"s", $"d",
        iters = 1000, stopOnFixpoint = true)
      .as[(Long, Long)].collect().toSet
    assert(stopped === fixed)
    assert(stopped === Set((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("labelPropagation stopOnFixpoint: period-2 oscillation throws") {
    // the canonical sync-LPA failure: a 2-cycle trades labels forever —
    // round 2 reproduces the initial state without ever reaching a
    // fixpoint; the stop-enabled path must surface that, not return
    // whichever phase the cap lands on
    val pair = Seq((8L, 9L), (9L, 8L)).toDF("s", "d")
    val e = intercept[IllegalStateException] {
      graft.ops.Graph.labelPropagation(pair, $"s", $"d",
        iters = 10, stopOnFixpoint = true).count()
    }
    assert(e.getMessage.contains("oscillation"))
    // the fixed-iteration mode stays available for exactly this graph
    val r2 = graft.ops.Graph.labelPropagation(pair, $"s", $"d", iters = 2)
      .as[(Long, Long)].collect().toSet
    assert(r2 === Set((8L, 8L), (9L, 9L)))
  }

  test("labelPropagation stopOnFixpoint: period-3 rotation throws at the cap") {
    // a directed 3-cycle rotates labels with period 3: never a fixpoint,
    // and never equal to the state two rounds back, so the two-round
    // lookback can't see it — the cap-exhaustion throw must (the
    // stop-enabled contract is fixpoint-or-throw, never an arbitrary
    // phase)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val e = intercept[IllegalStateException] {
      graft.ops.Graph.labelPropagation(cyc, $"s", $"d",
        iters = 7, stopOnFixpoint = true).count()
    }
    assert(e.getMessage.contains("cap"))
  }

  test("q140 precondition: no exact-30:00 gap in any scale factor's events") {
    // session_window's half-open end splits a gap of exactly 1800 s where
    // q32's `>` test merges it — the shared-oracle gate is exact only
    // while such gaps are absent, so pin the data property the gate
    // relies on (if a regenerated fixture ever trips this, q140 needs its
    // own oracle, not a silent hash failure).
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val n = Tables.load(spark, s"/root/testdata/$sf", "events")
        .select($"user_id", unix_micros($"ts").as("us"), $"event_id")
        .withColumn("prev", lag($"us", 1).over(
          org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
            .orderBy($"us", $"event_id")))
        .filter($"us" - $"prev" === 1800L * 1000000L)
        .count()
      assert(n === 0L, s"$sf has an exact-boundary gap: q140's shared " +
        "oracle is no longer exact")
    }
  }

  test("bm25Search: multi-term docs outrank single-term, n_terms counts matches") {
    val docs = Seq(
      (1L, "data query data stream"),      // all three terms
      (2L, "data data data data"),         // one term, high tf
      (3L, "nothing relevant here at all"),
      (4L, "query stream"),                // two terms
      (5L, "filler words beyond counting") // pushes idf up
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Search(docs, $"doc_id", $"text",
        Seq("data", "query", "stream"), k = 10)
      .select("doc_id", "n_terms", "score")
      .as[(Long, Long, Double)].collect().toSeq
    // doc 3 and 5 match nothing and are absent entirely
    assert(out.map(_._1).toSet === Set(1L, 2L, 4L))
    val byDoc = out.map(r => r._1 -> r).toMap
    assert(byDoc(1L)._2 === 3L && byDoc(4L)._2 === 2L && byDoc(2L)._2 === 1L)
    // three distinct matched terms beat everything else here
    assert(out.head._1 === 1L)
    // scores strictly positive and sorted descending (doc_id tiebreak)
    assert(out.forall(_._3 > 0.0))
    assert(out.map(_._3).sliding(2).forall(p => p.head >= p.last))
    // k truncates: k=1 returns exactly the winner
    val top1 = TextAnalysis.bm25Search(docs, $"doc_id", $"text",
      Seq("data", "query", "stream"), k = 1).collect()
    assert(top1.length === 1 && top1(0).getAs[Long]("doc_id") === 1L)
  }
}
