package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Graph, Profile, Similarity, TextAnalysis}

/** Hand-checked laws for the round-5 session-3 operators: k-core peel,
  * blocked fuzzy match, label-disagreement audit, MAD outliers, Cohen's
  * kappa, rare-token scoring, RRF fusion. */
class Round5cOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kCore: peel leaves the triangle, degrees measured inside the core") {
    // triangle 1-2-3 plus path 3-4-5: the 2-core is exactly the triangle
    // (4 and 5 peel in cascade), core degrees all 2
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("s", "d")
    val out = Graph.kCore(edges, $"s", $"d", k = 2)
      .orderBy("node").as[(Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("kCore: k above the max degree converges to the empty core") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("s", "d")
    assert(Graph.kCore(edges, $"s", $"d", k = 3).count() === 0L)
  }

  test("kCore: exhausting maxRounds mid-peel throws, never half-peels") {
    // path of 5 with k=2 peels over 3 rounds (ends empty); cap 1 must throw
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "d")
    val e = intercept[IllegalStateException] {
      Graph.kCore(edges, $"s", $"d", k = 2, maxRounds = 1)
    }
    assert(e.getMessage.contains("still peeling"))
  }

  test("fuzzyMatchBlocked: distinct-key grain, counts carried, dist gated") {
    // kitten appears twice (n_a must say 2); hat is too far from all
    val df = Seq("kitten", "sitten", "kitten", "mitten", "hat").toDF("name")
    val out = Dedup.fuzzyMatchBlocked(df, $"name", lit(1), maxDist = 2)
      .orderBy("key_a", "key_b")
      .as[(String, String, Long, Long, Long)].collect()
    assert(out.toSeq === Seq(
      ("kitten", "mitten", 1L, 2L, 1L),
      ("kitten", "sitten", 1L, 2L, 1L),
      ("mitten", "sitten", 1L, 1L, 1L)))
  }

  test("fuzzyMatchBlocked: pairs never cross blocks") {
    val df = Seq(("abc", 1), ("abd", 1), ("abe", 2)).toDF("name", "blk")
    val out = Dedup.fuzzyMatchBlocked(df, $"name", $"blk", maxDist = 3)
      .as[(String, String, Long, Long, Long)].collect()
    assert(out.toSeq === Seq(("abc", "abd", 1L, 1L, 1L)))
  }

  test("labelDisagreement: neighborhood majority vote flags the mislabel") {
    val rows = Seq(
      (1L, Array(1.0f, 0.0f), "A"),
      (2L, Array(1.0f, 0.1f), "A"),
      (3L, Array(0.9f, 0.05f), "B"))
    val df = rows.toDF("id", "vec", "lbl")
    val out = Similarity.labelDisagreement(df, $"id", $"vec", $"lbl",
        df, k = 2)
      .orderBy("query_id")
      .select("query_id", "label", "n_nbrs", "n_disagree", "suspect")
      .as[(Long, String, Long, Long, Boolean)].collect()
    // every query sees both other points; the B row disagrees with both
    assert(out.toSeq === Seq(
      (1L, "A", 2L, 1L, true),
      (2L, "A", 2L, 1L, true),
      (3L, "B", 2L, 2L, true)))
  }

  test("labelDisagreement: an agreeing neighborhood is not a suspect") {
    val rows = Seq(
      (1L, Array(1.0f, 0.0f), "A"),
      (2L, Array(1.0f, 0.1f), "A"),
      (3L, Array(0.9f, 0.05f), "A"),
      (4L, Array(-1.0f, 0.0f), "B"))
    val df = rows.toDF("id", "vec", "lbl")
    val out = Similarity.labelDisagreement(df, $"id", $"vec", $"lbl",
        df.filter($"id" === 1L), k = 2)
      .select("query_id", "n_disagree", "suspect")
      .as[(Long, Long, Boolean)].collect()
    // query 1's two nearest are 2 and 3 (both A); the far B point is not in k
    assert(out.toSeq === Seq((1L, 0L, false)))
  }

  test("madOutliers: robust center ignores the outlier; mad=0 degenerates") {
    val df = Seq(("g1", 1.0), ("g1", 1.0), ("g1", 1.0), ("g1", 1.0),
      ("g1", 100.0), ("g2", 1.0), ("g2", 2.0), ("g2", 3.0), ("g2", 4.0),
      ("g2", 5.0)).toDF("g", "v")
    val out = Profile.madOutliers(df, $"g", $"v", nSigma = 3.0)
      .orderBy("group_key")
      .select("group_key", "med", "mad", "n", "n_outliers", "outlier_rate")
      .as[(String, Double, Double, Long, Long, Double)].collect()
    // g1: med=1, mad=0 → every v != med flags (the documented degenerate)
    assert(out(0) === (("g1", 1.0, 0.0, 5L, 1L, 0.2)))
    // g2: med=3, ad=(2,1,0,1,2), mad=1 → nothing beyond 3*1
    assert(out(1) === (("g2", 3.0, 1.0, 5L, 0L, 0.0)))
  }

  test("cohensKappa: the textbook 2x2 example") {
    // 20 yy, 5 yn, 10 ny, 15 nn: po=0.7, pe=0.5, kappa=0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val out = Profile.cohensKappa(rows.toDF("a", "b"), $"a", $"b")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(out.toSeq === Seq((50L, 35L, 0.7, 0.5, 0.4)))
  }

  test("cohensKappa: constant equal raters yield null (vacuous), not 1") {
    val df = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    val out = Profile.cohensKappa(df, $"a", $"b")
      .select("kappa").collect()
    assert(out.head.isNullAt(0))
  }

  test("rareTokenRatio: integer share test against the corpus total") {
    // total=5 occurrences; f(a)=4 (4*4 >= 5, common), f(b)=1 (4 < 5, rare)
    val docs = Seq((1L, "a a a"), (2L, "a b")).toDF("id", "text")
    val out = TextAnalysis.rareTokenRatio(docs, $"id", $"text",
        shareDenom = 4L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq === Seq((1L, 3L, 0L, 0.0), (2L, 2L, 1L, 0.5)))
  }

  test("rrfFuse: missing-list items contribute zero, fusion reorders") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("query_id", "item_id", "rank")
    val b = Seq((1L, 11L, 1L), (1L, 12L, 2L)).toDF("query_id", "item_id", "rank")
    val out = Similarity.rrfFuse(a, b, k = 3)
      .orderBy("rank").as[(Long, Long, Long, Double)].collect()
    // item 11 is in both lists → wins over either solo item
    assert(out.map(_._2).toSeq === Seq(11L, 10L, 12L))
    val s11 = 1.0 / 62 + 1.0 / 61
    assert(math.abs(out(0)._4 -
      BigDecimal(s11).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      < 1e-12)
  }

  test("sourceOverlap: shared shingles, sizes, jaccard on a hand corpus") {
    val docs = Seq(
      ("s1", "a b c d"),   // shingles: "a b c", "b c d"
      ("s2", "a b c e"),   // shingles: "a b c", "b c e"
      ("s3", "x y z w")    // shingles: "x y z", "y z w"
    ).toDF("src", "text")
    val out = TextAnalysis.sourceOverlap(docs, $"src", $"text", n = 3)
      .orderBy("group_a", "group_b")
      .as[(String, String, Long, Long, Long, Double)].collect()
    // s1∩s2 = {"a b c"} → jaccard 1/3; s3 shares nothing (absent rows)
    assert(out.toSeq === Seq(("s1", "s2", 1L, 2L, 2L, 0.333333)))
  }

  test("sourceOverlap: duplicate shingles within a source count once") {
    val docs = Seq(("s1", "a b c"), ("s1", "a b c"), ("s2", "a b c"))
      .toDF("src", "text")
    val out = TextAnalysis.sourceOverlap(docs, $"src", $"text", n = 3)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.toSeq === Seq(("s1", "s2", 1L, 1L, 1L, 1.0)))
  }

  test("pathNgrams: only full n-grams count, ties break on path") {
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c"))
      .toDF("u", "seq", "t")
    val out = graft.ops.Funnel.pathNgrams(ev, $"u", $"t", Seq($"seq"),
        n = 3, k = 10)
      .as[(Long, String, Long)].collect()
    // user1: a>b>c, b>c>b; user2: a>b>c — no 2-step tails counted
    assert(out.toSeq === Seq((1L, "a>b>c", 2L), (2L, "b>c>b", 1L)))
  }

  test("tokenEntropy: uniform vs degenerate distributions") {
    val docs = Seq((1L, "a b c d"), (2L, "a a a a")).toDF("id", "text")
    val out = TextAnalysis.tokenEntropy(docs, $"id", $"text")
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    // uniform over 4 → ln 4; all-same → 0
    assert(out(0)._2 === 4L && out(0)._3 === 4L)
    assert(math.abs(out(0)._4 - 1.386294) < 1e-6)
    assert(out(1) === ((2L, 4L, 1L, 0.0)))
  }

  test("referentialAudit: orphans and unreferenced parents both counted") {
    val child = Seq(1L, 1L, 2L, 99L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Profile.referentialAudit("c->p", child, $"fk", parent, $"pk")
      .as[(String, Long, Long, Double, Long, Long, Double)].collect()
    // 99 is an orphan; parent 3 is unreferenced
    assert(out.toSeq === Seq(("c->p", 4L, 1L, 0.25, 3L, 1L, 0.666667)))
  }

  test("referentialAudit: null child keys are orphans (strict audit)") {
    val child = Seq(Some(1L), None).toDF("fk")
    val parent = Seq(1L).toDF("pk")
    val out = Profile.referentialAudit("c->p", child, $"fk", parent, $"pk")
      .select("n_orphans").as[Long].collect()
    assert(out.toSeq === Seq(1L))
  }

  test("benfordDigits: integer-side digit extraction, shares + expectation") {
    val df = Seq(("g", 1.23), ("g", 19.0), ("g", 0.02), ("g", 300.0),
      ("g", -5.0)).toDF("grp", "v")
    val out = Profile.benfordDigits(df, $"grp", $"v")
      .orderBy("digit")
      .select("digit", "n", "share", "expected")
      .as[(Long, Long, Double, Double)].collect()
    // -5 excluded; digits: 1.23→1, 19.0→1, 0.02→2, 300.0→3
    assert(out.map(r => (r._1, r._2)).toSeq ===
      Seq((1L, 2L), (2L, 1L), (3L, 1L)))
    assert(out(0)._3 === 0.5)
    assert(math.abs(out(0)._4 - math.log10(2.0)) < 1e-6)
  }

  test("snapshotDiff: added/removed/changed with column lists, delta-sized") {
    val oldV = Seq((1L, Some("x"), 10.0), (2L, Some("y"), 20.0),
      (3L, Some("z"), 30.0)).toDF("k", "s", "v")
    val newV = Seq((1L, Some("x"), 10.0), (2L, None: Option[String], 21.0),
      (4L, Some("w"), 40.0)).toDF("k", "s", "v")
    val out = graft.enrich.Enrich.snapshotDiff(oldV, newV, "k", Seq("s", "v"))
      .orderBy("k").as[(Long, String, Option[String])].collect()
    // key 1 unchanged → omitted; key 2: both cols differ (null-safely)
    assert(out.toSeq === Seq(
      (2L, "changed", Some("s,v")),
      (3L, "removed", None),
      (4L, "added", None)))
  }

  test("zipfFit: an exact power-law two-type corpus fits slope -1") {
    val docs = Seq((1L, "a a a a b b")).toDF("id", "text")
    val out = TextAnalysis.zipfFit(docs, $"text")
      .as[(Long, Long, Double, Double)].collect()
    // freqs 4,2 at ranks 1,2: slope (ln2-ln4)/(ln2-0) = -1, intercept ln4
    assert(out.head._1 === 2L && out.head._2 === 6L)
    assert(out.head._3 === -1.0)
    assert(math.abs(out.head._4 - 1.386294) < 1e-6)
  }

  test("groupOls: exact line recovered; constant x yields nulls") {
    val df = Seq(("g1", 0, 1.0), ("g1", 1, 3.0), ("g1", 2, 5.0),
      ("g2", 7, 1.0), ("g2", 7, 9.0)).toDF("g", "x", "y")
    val out = Profile.groupOls(df, $"g", $"x", $"y")
      .orderBy("group_key")
      .as[(String, Long, Option[Double], Option[Double])].collect()
    assert(out(0) === (("g1", 3L, Some(2.0), Some(1.0))))
    assert(out(1) === (("g2", 2L, None, None)))
  }

  test("weightedPageRank: mass splits by weight share, duplicates combine") {
    // a's mass splits 1:3 between b and c; the duplicate a->c edges
    // (1 + 2) must combine to weight 3
    val edges = Seq(("a", "b", 1L), ("a", "c", 1L), ("a", "c", 2L),
      ("b", "a", 1L), ("c", "a", 1L)).toDF("s", "d", "w")
    val out = Graph.weightedPageRank(edges, $"s", $"d", $"w", iters = 1)
      .orderBy("node").as[(String, Double)].collect().toMap
    val third = 1.0 / 3.0
    assert(math.abs(out("a") - (0.05 + 0.85 * (third + third))) < 1e-12)
    assert(math.abs(out("b") - (0.05 + 0.85 * (third * (1.0 / 4.0)))) < 1e-12)
    assert(math.abs(out("c") - (0.05 + 0.85 * (third * (3.0 / 4.0)))) < 1e-12)
  }

  test("weightedPageRank: uniform weights reduce to unweighted pageRank") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"))
      .toDF("s", "d")
    val w = Graph.weightedPageRank(edges, $"s", $"d", lit(7L), iters = 2)
      .orderBy("node").as[(String, Double)].collect()
    val u = Graph.pageRank(edges, $"s", $"d", iters = 2)
      .orderBy("node").as[(String, Double)].collect()
    w.zip(u).foreach { case ((wn, wr), (un, ur)) =>
      assert(wn === un)
      assert(math.abs(wr - ur) < 1e-12)
    }
  }

  test("frequentItemTriples: basket combinations counted, dup rows collapse") {
    val li = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 12L),
      (2L, 10L), (2L, 11L), (2L, 12L), (3L, 10L), (3L, 11L))
      .toDF("b", "i")
    val out = graft.ops.Funnel.frequentItemTriples(li, $"b", $"i", k = 5)
      .as[(Long, Long, Long, Long, Long)].collect()
    // (10,11,12) in baskets 1 and 2; basket 3 has only a pair
    assert(out.toSeq === Seq((1L, 10L, 11L, 12L, 2L)))
  }

  test("rfmScores: quintile codes with the metric-then-id total order") {
    import java.sql.Timestamp
    val ev = (1 to 5).flatMap { u =>
      (0 until u).map(i =>
        (u.toLong, Timestamp.valueOf(f"2024-01-${u + i}%02d 00:00:00"),
          u * 10.0))
    }.toDF("user_id", "ts", "value")
    val out = graft.ops.Funnel.rfmScores(ev, $"user_id", $"ts", $"value")
      .orderBy("user_id")
      .select("user_id", "recency_days", "frequency", "r", "f", "m", "rfm")
      .as[(Long, Long, Long, Long, Long, Long, String)].collect()
    // user 5 has the latest event (recency 0), most events, highest value
    assert(out(4) === ((5L, 0L, 5L, 5L, 5L, 5L, "555")))
    // user 1: one event on day 1, recency 8 days before user 5's last
    assert(out(0)._2 === 8L && out(0)._3 === 1L)
    assert(out(0)._4 === 1L && out(0)._5 === 1L && out(0)._6 === 1L)
  }

  test("survivalCurve: never-converters stay in the cohort denominator") {
    import java.sql.Timestamp
    def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val ev = Seq(
      (1L, "view", t(1)), (1L, "purchase", t(2)),   // converts day 1
      (2L, "view", t(1)), (2L, "purchase", t(4)),   // converts day 3
      (3L, "view", t(5)),                           // never converts
      (4L, "purchase", t(1)), (4L, "view", t(3))    // pre-t0 purchase only
    ).toDF("user_id", "event_type", "ts")
    val out = graft.ops.Funnel.survivalCurve(ev, $"user_id", $"event_type",
        $"ts", "view", "purchase", horizonDays = 3)
      .as[(Long, Long, Long, Double)].collect()
    // cohort = 4 viewers; users 3 and 4 never convert (4's purchase
    // precedes its first view and must not count)
    assert(out.toSeq === Seq(
      (0L, 4L, 0L, 1.0), (1L, 4L, 1L, 0.75),
      (2L, 4L, 1L, 0.75), (3L, 4L, 2L, 0.5)))
  }

  test("goldenRecord: min/max/modal survivorship with tie-break") {
    val df = Seq(
      ("w", 3L, 10.0, Some("b2")), ("w", 1L, 30.0, Some("b1")),
      ("w", 2L, 20.0, Some("b1")), ("x", 9L, 5.0, None))
      .toDF("name", "k", "price", "brand")
    val out = graft.enrich.Enrich.goldenRecord(df, $"name",
        minCols = Seq("k"), maxCols = Seq("price"),
        modalCols = Seq("brand"))
      .orderBy("key")
      .as[(String, Long, Long, Double, Option[String])].collect()
    assert(out.toSeq === Seq(
      ("w", 3L, 1L, 30.0, Some("b1")),
      ("x", 1L, 9L, 5.0, None)))
  }

  test("goldenRecord: modal tie breaks on the smaller value") {
    val df = Seq(("w", "b2"), ("w", "b1")).toDF("name", "brand")
    val out = graft.enrich.Enrich.goldenRecord(df, $"name",
        minCols = Nil, maxCols = Nil, modalCols = Seq("brand"))
      .select("modal_brand").as[String].collect()
    assert(out.toSeq === Seq("b1"))
  }

  test("mergeIntervals: covered-by-earlier events stay in one island") {
    import java.sql.Timestamp
    def t(m: Int, sec: Int = 0) =
      Timestamp.valueOf(f"2024-01-01 00:$m%02d:$sec%02d")
    // events at 0:00, 0:03, 0:04:30 chain one island (5-min hold);
    // 0:20 opens a second
    val ev = Seq((1L, t(0), 1L), (1L, t(3), 2L), (1L, t(4, 30), 3L),
      (1L, t(20), 4L)).toDF("u", "ts", "id")
    val out = graft.ops.Timeseries.mergeIntervals(ev, $"u", $"ts",
        Seq($"ts", $"id"), holdSeconds = 300L)
      .orderBy("island")
      .select("key", "island", "n_events", "covered_seconds")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 1L, 3L, 570L), (1L, 2L, 1L, 300L)))
  }

  test("mergeIntervals: running max merges what lag would split") {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // long hold: event A [0, 20min) covers B [1, 21min) covers C [19, 39)
    // — every adjacent pair overlaps through the running max
    val ev = Seq((1L, t(0), 1L), (1L, t(1), 2L), (1L, t(19), 3L))
      .toDF("u", "ts", "id")
    val out = graft.ops.Timeseries.mergeIntervals(ev, $"u", $"ts",
        Seq($"ts", $"id"), holdSeconds = 1200L)
      .select("island", "n_events").as[(Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 3L)))
  }

  test("debounce: a kept event resets the clock (sequential semantics)") {
    import java.sql.Timestamp
    def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    // events at 0, 40, 70, 130 with 60s gap: keep 0; 40 dropped (40<60);
    // 70 kept (70-0>=60); 130 kept (130-70>=60). A lag-based rule would
    // wrongly drop 70 (70-40=30<60).
    val ev = Seq((1L, t(0), 1L), (1L, t(40), 2L), (2L, t(0), 10L))
      .union(Seq((1L, Timestamp.valueOf("2024-01-01 00:01:10"), 3L),
        (1L, Timestamp.valueOf("2024-01-01 00:02:10"), 4L)))
      .toDF("u", "ts", "id")
    val out = graft.ops.Timeseries.debounce(ev, $"u", $"ts", $"id",
        minGapSeconds = 60L)
      .orderBy("key", "id").as[(Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 1L), (1L, 3L), (1L, 4L), (2L, 10L)))
  }

  test("scd2SnapshotAt: reconstruction law on a two-version history") {
    val cur = Seq((1L, "a"), (2L, "b")).toDF("k", "attr")
    val inc = Seq((1L, "a2"), (3L, "c")).toDF("k", "attr")
    val hist = graft.enrich.Enrich.scd2Merge(cur, inc, Seq("k"),
      Seq("attr"), effective = "2024-02-01")
    val before = graft.enrich.Enrich.scd2SnapshotAt(hist, "2024-01-15")
      .orderBy("k").as[(Long, String)].collect()
    val after = graft.enrich.Enrich.scd2SnapshotAt(hist, "2024-03-01")
      .orderBy("k").as[(Long, String)].collect()
    // before = cur verbatim (2 removed-later keys included); after = inc
    // plus the unchanged-but-absent key 2 closed at the effective date
    assert(before.toSeq === Seq((1L, "a"), (2L, "b")))
    assert(after.toSeq === Seq((1L, "a2"), (3L, "c")))
  }

  test("paretoFrontier2D: strict dominance only; equal points both survive") {
    val df = Seq(
      (1L, 3.0, 1.0),  // frontier (best x)
      (2L, 2.0, 2.0),  // frontier
      (3L, 1.0, 3.0),  // frontier
      (4L, 2.0, 1.5),  // dominated by 2 (same x, lower y)
      (5L, 1.0, 1.0),  // dominated by 2 (both strictly better)
      (6L, 2.0, 2.0)   // equal to 2 — both stay
    ).toDF("id", "x", "y")
    val out = Profile.paretoFrontier2D(df, $"id", $"x", $"y")
      .orderBy("id").as[(Long, Double, Double)].collect()
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L, 6L))
  }

  test("reliabilityBins: equal-count bins, mean score and positive rate") {
    val df = (1 to 10).map(i => (i.toLong, i / 10.0, i > 5))
      .toDF("id", "s", "p")
    val out = graft.ops.Eval.reliabilityBins(df, $"id", $"s", $"p", bins = 2)
      .orderBy("bin").as[(Long, Long, Double, Double)].collect()
    // low bin = scores .1-.5 (no positives), high = .6-1.0 (all positive)
    assert(out.toSeq === Seq((1L, 5L, 0.3, 0.0), (2L, 5L, 0.8, 1.0)))
  }

  test("binaryAuc: perfect separation = 1, ties average to 0.5 credit") {
    val perfect = Seq((0.1, false), (0.2, false), (0.8, true), (0.9, true))
      .toDF("s", "p")
    val a1 = graft.ops.Eval.binaryAuc(perfect, $"s", $"p")
      .as[(Long, Long, Double)].collect().head
    assert(a1 === ((2L, 2L, 1.0)))
    // every score tied: AUC must be exactly 0.5, not tie-break-dependent
    val tied = Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false))
      .toDF("s", "p")
    val a2 = graft.ops.Eval.binaryAuc(tied, $"s", $"p")
      .as[(Long, Long, Double)].collect().head
    assert(a2 === ((2L, 2L, 0.5)))
  }

  test("binaryAuc: single-class input yields null, not a crash") {
    val df = Seq((0.5, true), (0.7, true)).toDF("s", "p")
    val out = graft.ops.Eval.binaryAuc(df, $"s", $"p").collect().head
    assert(out.isNullAt(2))
  }

  test("classifierMetrics: textbook precision/recall/F1, invented class kept") {
    // actual: a,a,a,b; predicted: a,a,b,c — c is invented (recall null)
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "c"))
      .toDF("act", "pred")
    val out = graft.ops.Eval.classifierMetrics(df, $"act", $"pred")
      .orderBy("label")
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect()
    // a: tp=2, pred=2, actual=3 → p=1.0, r=2/3, f1=0.8
    assert(out(0) === (("a", 3L, 2L, 2L, Some(1.0), Some(0.666667),
      Some(0.8))))
    // b: tp=0 → precision/recall 0, f1 null (0/0 guard)
    assert(out(1) === (("b", 1L, 1L, 0L, Some(0.0), Some(0.0), None)))
    // c: never actual → recall null
    assert(out(2) === (("c", 0L, 1L, 0L, Some(0.0), None, None)))
  }

  test("linearAttribution: exact conservation, largest-remainder order") {
    import java.sql.Timestamp
    def t(d: Int, h: Int = 0) =
      Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // one $1.00 purchase with 3 prior clicks on two days:
    // 100 cents / 3 = base 33, remainder 1 -> earliest click gets 34
    val ev = Seq(
      (1L, "click", t(1), 10L, 0.0), (1L, "click", t(2), 11L, 0.0),
      (1L, "click", t(2, 5), 12L, 0.0), (1L, "purchase", t(3), 13L, 1.0),
      (2L, "purchase", t(3), 20L, 5.0)) // no clicks -> no credit rows
      .toDF("user_id", "event_type", "ts", "event_id", "value")
    val out = graft.ops.Funnel.linearAttribution(ev, $"user_id",
        $"event_type", $"ts", $"event_id", $"value", "click", "purchase",
        windowDays = 7)
      .orderBy("day")
      .select("user_id", "n_touches", "credit_cents")
      .as[(Long, Long, Long)].collect()
    // day1: the earliest click takes 34; day2: two clicks at 33 each
    assert(out.toSeq === Seq((1L, 1L, 34L), (1L, 2L, 66L)))
    // conservation: total credit == the purchase's 100 cents exactly
    assert(out.map(_._3).sum === 100L)
  }

  test("contributionShares: shares and ranks from exact sums") {
    val df = Seq(("r1", "n1", 30.0), ("r1", "n2", 10.0), ("r2", "n3", 60.0))
      .toDF("region", "nation", "rev")
    val out = Profile.contributionShares(df, $"region", $"nation", $"rev")
      .orderBy("parent", "child")
      .as[(String, String, Double, Double, Double, Long)].collect()
    assert(out.toSeq === Seq(
      ("r1", "n1", 30.0, 0.75, 0.4, 1L),
      ("r1", "n2", 10.0, 0.25, 0.4, 2L),
      ("r2", "n3", 60.0, 1.0, 0.6, 1L)))
  }

  test("asOfJoinTolerance: stale matches blank out, fresh ones survive") {
    import java.sql.Timestamp
    def t(h: Int, m: Int = 0) =
      Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val left = Seq((1L, t(10), 100L), (1L, t(12), 101L), (2L, t(10), 200L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, t(9, 30), 7L)).toDF("k", "rts", "rid")
    val out = graft.ops.TemporalJoin.asOfJoinTolerance(
        left, Seq("k"), col("ts"), right, Seq("k"), col("rts"),
        Map("matched" -> col("rid")), toleranceSeconds = 3600L)
      .orderBy("lid").select("lid", "matched")
      .as[(Long, Option[Long])].collect()
    // 10:00 is 30min after the 9:30 right row (fresh); 12:00 is 2.5h
    // stale; key 2 never matches
    assert(out.toSeq === Seq((100L, Some(7L)), (101L, None), (200L, None)))
  }

  test("equiDepthHistogram: equal counts, adaptive boundaries") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val out = Profile.equiDepthHistogram(df, $"g", $"v", buckets = 4)
      .orderBy("bucket")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(out.map(_._3).toSeq === Seq(25L, 25L, 25L, 25L))
    assert(out.head._4 === 1.0 && out.last._5 === 100.0)
    // heavy tail: boundaries adapt, no empty top band
    val skew = ((1 to 97).map(_ => 1.0) ++ Seq(50.0, 75.0, 100.0))
      .map(("g", _)).toDF("g", "v")
    val out2 = Profile.equiDepthHistogram(skew, $"g", $"v", buckets = 4)
      .orderBy("bucket").as[(String, Long, Long, Double, Double)].collect()
    assert(out2.map(_._2).contains(4L)) // top band exists and is non-empty
  }

  test("applyCdc: last op wins, final delete drops the key") {
    val log = Seq(
      (1L, 1L, "I", Some("a")), (1L, 2L, "U", Some("a2")),
      (2L, 1L, "I", Some("b")), (2L, 2L, "D", None),
      (3L, 2L, "I", Some("c")), (3L, 1L, "D", None) // delete BEFORE insert
    ).toDF("k", "seq", "op", "payload")
    val out = graft.idempotent.Idempotent.applyCdc(log, Seq("k"),
        $"seq", $"op", Seq("payload"))
      .orderBy("k").as[(Long, String)].collect()
    // key 1 keeps the update; key 2 is deleted; key 3's insert at a
    // LATER seq survives the earlier delete (ordering, not op priority)
    assert(out.toSeq === Seq((1L, "a2"), (3L, "c")))
  }

  test("twoHopReach: path graph distances, no self/1-hop double count") {
    // path 1-2-3-4: node 1 sees {2} at d1, {3} at d2 → reach_x2 = 3
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val out = Graph.twoHopReach(edges, $"s", $"d")
      .orderBy("node").as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq(
      (1L, 1L, 1L, 3L), (2L, 2L, 1L, 5L), (3L, 2L, 1L, 5L),
      (4L, 1L, 1L, 3L)))
  }

  test("twoHopReach: triangle has no distance-2 nodes") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("s", "d")
    val out = Graph.twoHopReach(edges, $"s", $"d")
      .select("n2").as[Long].collect()
    assert(out.toSeq === Seq(0L, 0L, 0L))
  }

  test("bpeMergeOnce: left-to-right non-overlap, composition with rounds") {
    val toks = Seq(
      (1L, Seq("a", "b", "c", "a", "b")),
      (2L, Seq("a", "a", "a")),           // self-pair: merge once, not twice
      (3L, Seq("x"))
    ).toDF("doc_id", "tk")
    val m1 = TextAnalysis.bpeMergeOnce(toks, "a", "b")
      .orderBy("doc_id").as[(Long, Seq[String])].collect()
    assert(m1(0)._2 === Seq("a b", "c", "a b"))
    assert(m1(1)._2 === Seq("a", "a", "a")) // no (a,b) pairs here
    assert(m1(2)._2 === Seq("x"))
    val selfMerge = TextAnalysis.bpeMergeOnce(toks, "a", "a")
      .filter($"doc_id" === 2L).as[(Long, Seq[String])].collect()
    // "a a a" -> ["a a", "a"]: the consumed middle token can't re-pair
    assert(selfMerge.head._2 === Seq("a a", "a"))
    // merged tokens compose: ("a b", "c") can merge next round
    val m2 = TextAnalysis.bpeMergeOnce(
        TextAnalysis.bpeMergeOnce(toks, "a", "b"), "a b", "c")
      .filter($"doc_id" === 1L).as[(Long, Seq[String])].collect()
    assert(m2.head._2 === Seq("a b c", "a b"))
  }

  test("cdcApplyStream: frontier advances across batches, stale seqs die in state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String, Double)]
    val out = graft.streaming.Streaming.cdcApplyStream(
      input.toDF.toDF("k", "seq", "op", "v"), "k", "seq", "op", Seq("v"))
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("cdc_test").start()
    try {
      input.addData((1L, 1L, "I", 10.0), (2L, 1L, "I", 20.0))
      q.processAllAvailable()
      // batch 2: key 1 advances to an update; key 2 REDELIVERS seq 1 —
      // the state must suppress it (no new emission for key 2)
      input.addData((1L, 2L, "U", 11.0), (2L, 1L, "I", 20.0))
      q.processAllAvailable()
      val rows = spark.table("cdc_test")
        .as[(Long, Long, String, String)].collect()
      assert(rows.count(_._1 == 2L) === 1) // redelivery emitted nothing new
      val k1 = rows.filter(_._1 == 1L).maxBy(_._2)
      assert(k1._2 === 2L && k1._3 === "U" && k1._4.contains("11.0"))
    } finally q.stop()
  }

  test("featureScale: exact min-max and z-score; constant groups null out") {
    val df = Seq(("g1", 1L, 0.0), ("g1", 2L, 5.0), ("g1", 3L, 10.0),
      ("g2", 4L, 7.0), ("g2", 5L, 7.0)).toDF("g", "id", "v")
    val out = Profile.featureScale(df, $"g", $"id", $"v")
      .orderBy("id")
      .as[(String, Long, Double, Option[Double], Option[Double])].collect()
    assert(out(0) === (("g1", 1L, 0.0, Some(0.0), Some(-1.224745))))
    assert(out(1) === (("g1", 2L, 5.0, Some(0.5), Some(0.0))))
    assert(out(2) === (("g1", 3L, 10.0, Some(1.0), Some(1.224745))))
    // constant group: zero range AND zero variance — both null
    assert(out(3)._4.isEmpty && out(3)._5.isEmpty)
  }

  test("lag1Autocorr: alternating series is perfectly anti-correlated") {
    import java.sql.Timestamp
    def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // daily counts 1,2,1,2,1 -> lag-1 pairs (1,2),(2,1),(1,2),(2,1)
    val ev = (Seq(t(1)) ++ Seq(t(2), t(2)) ++ Seq(t(3)) ++
      Seq(t(4), t(4)) ++ Seq(t(5))).map(("a", _)).toDF("g", "ts")
    val out = Profile.lag1Autocorr(ev, $"g", $"ts")
      .as[(String, Long, Option[Double])].collect()
    assert(out.toSeq === Seq(("a", 4L, Some(-1.0))))
  }

  test("lag1Autocorr: gaps break pairs; constant series yields null") {
    import java.sql.Timestamp
    def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // days 1,2 then a gap then 5,6: only 2 pairs, all counts equal -> null
    val ev = Seq(t(1), t(2), t(5), t(6)).map(("a", _)).toDF("g", "ts")
    val out = Profile.lag1Autocorr(ev, $"g", $"ts")
      .as[(String, Long, Option[Double])].collect()
    assert(out.toSeq === Seq(("a", 2L, None)))
  }

  test("int8Ranking: integer dots, id tie-break, self excluded") {
    val rows = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.5f, 0.5f)),
      (3L, Array(-1.0f, 0.0f)))
    val df = rows.toDF("id", "vec")
    val out = Similarity.int8Ranking(df, $"id", $"vec",
        df.filter($"id" === 1L), $"id", $"vec", k = 2)
      .orderBy("rank").as[(Long, Long, Long, Long)].collect()
    // qv: (127,0), (127,127), (-127,0) → dots 16129 and -16129
    assert(out.toSeq === Seq((1L, 2L, 16129L, 1L), (1L, 3L, -16129L, 2L)))
  }
}
