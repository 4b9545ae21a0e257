package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.idempotent.Idempotent
import graft.normalize.Normalize

/** Property-based laws (SURVEY.md §5.3): idempotency of the incremental
  * load, cast-or-null never throwing, conform always hitting the target
  * schema. Uses seeded ScalaCheck generators sampled directly (the
  * scalatest-scalacheck bridge isn't on the offline classpath); Spark jobs
  * per case are expensive, so cases are few but adversarial (duplicate
  * keys, empty strings, uncastable values).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).map { i =>
      gen(Gen.Parameters.default.withSize(12), Seed(42L + i))
        .getOrElse(fail("generator exhausted"))
    }

  private val rowGen = for {
    m <- Gen.oneOf("a", "b", "c", "são paulo", "")
    ano <- Gen.choose(2020L, 2022L)
    mes <- Gen.choose(1L, 3L)
    v <- Gen.choose(-100.0, 100.0)
  } yield (m, ano, mes, v)

  test("law: load(load(t, x), x) == load(t, x) for arbitrary row multisets") {
    samples(Gen.nonEmptyListOf(rowGen), 5).foreach { rows =>
      val dir = TestSpark.tmpDir("prop") + "/t"
      val df = rows.toDF("municipio", "ano_ref", "mes_ref", "v")
      val keys = Seq("municipio", "ano_ref", "mes_ref")
      Idempotent.incrementalAppend(spark, df, dir, keys)
      val after1 = spark.read.parquet(dir).count()
      val stats2 = Idempotent.incrementalAppend(spark, df, dir, keys)
      val after2 = spark.read.parquet(dir).count()
      assert(stats2.loaded === 0L, s"re-load inserted rows for $rows")
      assert(after1 === after2)
      val distinctKeys = df.select("municipio", "ano_ref", "mes_ref")
        .distinct().count()
      assert(spark.read.parquet(dir)
        .select("municipio", "ano_ref", "mes_ref").distinct().count()
        === distinctKeys)
    }
  }

  test("law: native as-of join equals the theta-join + argmax formulation") {
    import java.sql.Timestamp
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val pairGen = for {
      k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 50L)
    } yield (k, t)
    samples(Gen.zip(Gen.nonEmptyListOf(pairGen), Gen.nonEmptyListOf(pairGen)), 4)
      .foreach { case (ls, rs) =>
        val l = ls.zipWithIndex.map { case ((k, t), i) =>
          (i.toLong, k, new Timestamp(t * 1000)) }.toDF("lid", "k", "t")
        val r = rs.zipWithIndex.map { case ((k, t), i) =>
          (i.toLong + 1000, k, new Timestamp(t * 1000)) }.toDF("rid", "rk", "rt")
          .groupBy("rk", "rt").agg(max("rid").as("rid")) // unique per (key, time)
        val native = graft.plans.AsOfJoin
          .asOf(l, Seq("k"), "t", r, Seq("rk"), "rt", Seq("rid"))
          .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
        val w = Window.partitionBy(col("lid")).orderBy(col("rt").desc_nulls_last)
        val naive = l.join(r, col("k") === col("rk") && col("rt") <= col("t"), "left")
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
        assert(native === naive, s"left=$ls right=$rs")
      }
  }

  test("law: cast-or-null never throws, every row yields a value") {
    import org.apache.spark.sql.functions._
    val strGen = Gen.oneOf(Gen.alphaNumStr, Gen.numStr,
      Gen.const(null: String), Gen.const("9" * 30), Gen.const("-7"),
      Gen.const("1.5"), Gen.const("NaN"), Gen.const(""))
    samples(Gen.listOfN(8, strGen), 5).foreach { xs =>
      val out = xs.toDF("v")
        .select(Normalize.coerceOrDefault(col("v"), "long", lit(-1L)).as("r"))
        .as[Long].collect()
      assert(out.length === xs.length, s"row lost for input $xs")
    }
  }

  test("law: containment directions agree on the shared-shingle count") {
    // C(A->B)*|A| and C(B->A)*|B| are the SAME |A∩B|: the operator's two
    // directed rows for a pair must carry identical n_shared, and
    // containment must stay in (0, 1].
    import org.apache.spark.sql.functions.col
    val docs = spark.range(0, 60).selectExpr("id AS doc_id",
      // overlapping synthetic texts: doc i shares a suffix with doc i+1
      """concat_ws(' ',
           'tok' || CAST(id AS STRING), 'alpha beta gamma delta',
           'tok' || CAST(id + 1 AS STRING), 'epsilon zeta eta theta',
           'common tail words here') AS text""")
    val pairs = graft.ops.Dedup.containmentPairs(
      docs, col("doc_id"), col("text"), n = 3, minContain = 0.0001,
      maxDf = 1000)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        (r.getAs[Long]("n_shared"), r.getAs[Double]("containment"))).toMap
    assert(pairs.nonEmpty)
    pairs.foreach { case ((a, b), (n, c)) =>
      assert(c > 0.0 && c <= 1.0, s"containment($a->$b)=$c out of range")
      val rev = pairs.get((b, a))
      assert(rev.isDefined, s"pair ($b,$a) missing — directions must pair")
      assert(rev.get._1 === n, s"n_shared asymmetric for ($a,$b)")
    }
  }

  private val eventGen = for {
    u <- Gen.choose(1L, 5L)
    dayOff <- Gen.choose(0L, 9L)
    us <- Gen.choose(0L, 86399000000L)
    typ <- Gen.oneOf("view", "click", "buy")
    v <- Gen.choose(0.0, 100.0).map(x => math.rint(x * 100) / 100)
  } yield (u, new java.sql.Timestamp(
    (19723L + dayOff) * 86400000L + us / 1000), typ, v)

  test("law: conservation invariants of the behavior/timeseries operators") {
    import org.apache.spark.sql.functions._
    samples(Gen.nonEmptyListOf(eventGen), 3).foreach { rows =>
      val ev = rows.zipWithIndex
        .map { case ((u, ts, typ, v), i) => (u, ts, i.toLong, typ, v) }
        .toDF("user_id", "ts", "event_id", "event_type", "value")
      val users = ev.select("user_id").distinct().count()
      val events = ev.count()

      // resample: per key, every n_events lands somewhere — totals conserve
      val grid = ops.Timeseries.resampleDailyFfill(ev, $"user_id", $"ts",
        $"value")
      assert(grid.agg(sum("n_events")).as[Long].head === events,
        "resample lost or invented events")
      // and the grid is dense: rows per key == span days
      val spans = ev.groupBy("user_id")
        .agg((datediff(max(to_date($"ts")), min(to_date($"ts"))) + 1)
          .cast("long").as("d"))
        .agg(sum("d")).as[Long].head
      assert(grid.count() === spans, "grid not dense over the span")

      // cohorts: offset-0 actives across cohorts == all users, exactly once
      val coh = ops.Funnel.cohortRetention(ev, $"user_id", $"ts")
      assert(coh.filter($"week_offset" === 0L).agg(sum("n_active"))
        .as[Long].head === users)
      assert(coh.filter($"retention" > 1.0).count() === 0L)

      // transitions + gaps: each key contributes (count-1) consecutive pairs
      val pairsExpected = ev.groupBy("user_id").count()
        .agg(sum(col("count") - 1L)).as[Long].head
      assert(ops.Funnel.transitions(ev, $"user_id", $"event_type",
        Seq($"ts", $"event_id")).agg(sum("n")).as[Long].head
        === pairsExpected)
      assert(ops.Timeseries.gapHistogram(ev, $"user_id", $"ts",
        Seq($"ts", $"event_id")).agg(sum("n_gaps")).as[Long].head
        === pairsExpected)

      // TWAP stays inside the day's observed value range
      val twap = ops.Timeseries.timeWeightedAvg(ev, $"user_id", $"ts",
        $"value", Seq($"ts", $"event_id"))
      val bounds = ev.groupBy($"user_id".as("key"),
          to_date($"ts").as("day"))
        .agg(min("value").as("lo"), max("value").as("hi"))
      assert(twap.join(bounds, Seq("key", "day"))
        .filter($"twap" < $"lo" - 1e-9 || $"twap" > $"hi" + 1e-9)
        .count() === 0L, "TWAP escaped the day's value range")
    }
  }

  test("law: coverage of a corpus against itself is exactly 1.0") {
    // every shingle of a doc is in the reference when the reference IS the
    // corpus — coverage must be exactly 1 for every doc with shingles
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six seven"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.coverageScore(
        docs, $"doc_id", $"text", docs, $"text", n = 3)
      .select("doc_id", "coverage").as[(Long, Double)].collect().toMap
    assert(out.size === 3)
    assert(out.values.forall(_ === 1.0), s"self-coverage != 1: $out")
  }

  test("law: coverage against a disjoint reference is exactly 0.0") {
    val corpus = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val ref = Seq((9L, "uno dos tres cuatro cinco")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.coverageScore(
        corpus, $"doc_id", $"text", ref, $"text", n = 3)
      .select("n_known", "coverage").as[(Long, Double)].collect()
    assert(out === Array((0L, 0.0)))
  }

  test("law: skewReport shares are ranked, positive, and sum to <= 1") {
    samples(Gen.nonEmptyListOf(Gen.chooseNum(1L, 20L)), 8).foreach { keys =>
      val df = keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
        .toDF("k", "row")
      val rep = graft.ops.Skew.skewReport(df, $"k", k = 5)
        .select("rank", "n_rows", "share")
        .as[(Long, Long, Double)].collect().sortBy(_._1)
      assert(rep.nonEmpty && rep.length <= 5)
      // ranked by count descending, shares consistent with counts
      assert(rep.sliding(2).forall {
        case Array(a, b) => a._2 >= b._2; case _ => true })
      // each share rounds to 6dp and can round UP by 5e-7 — k of them can
      // overshoot 1 by k*5e-7
      assert(rep.map(_._3).sum <= 1.0 + 5 * 5e-7)
      assert(rep.forall(r => r._3 > 0.0))
      // top share is exact: n_rows / total
      val total = keys.size.toDouble
      assert(math.abs(rep.head._3 - rep.head._2 / total) < 1e-6)
    }
  }

  test("law: embeddingHealth counts every vector and unit-norm detection is exact") {
    val rows = Seq(
      (0, 1L, Seq(1.0f, 0.0f, 0.0f)),        // unit
      (0, 2L, Seq(0.0f, 3.0f, 4.0f)),        // norm 5
      (1, 3L, Seq(0.6f, 0.8f, 0.0f)))        // unit
      .toDF("g", "id", "v")
    val out = graft.ops.Profile.embeddingHealth(rows, $"g", $"id", $"v")
      .select("group_key", "n_vectors", "min_norm", "max_norm", "n_unit")
      .as[(Int, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(0) === ((2L, 1.0, 5.0, 1L)))
    assert(out(1) === ((1L, 1.0, 1.0, 1L)))
  }

  test("law: embeddingHealth counts null/empty vectors as norm 0, not drops") {
    // the broken vectors are the ones the health check exists to surface:
    // a null array and an empty array must appear in n_vectors with norm 0
    val rows = Seq(
      (0, 1L, Some(Seq(1.0f, 0.0f))),
      (0, 2L, Some(Seq.empty[Float])),
      (0, 3L, Option.empty[Seq[Float]]))
      .toDF("g", "id", "v")
    val out = graft.ops.Profile.embeddingHealth(rows, $"g", $"id", $"v")
      .select("n_vectors", "min_norm", "max_norm", "n_unit")
      .as[(Long, Double, Double, Long)].collect()
    assert(out === Array((3L, 0.0, 1.0, 1L)))
  }

  test("law: driftSeries ignores null timestamps (no phantom null-day row)") {
    // a null day has no neighbor in the shifted self-join; letting it
    // through would surface its histogram twice as two unmatched sides —
    // a spurious drift=2.0 row for a day that doesn't exist
    val rows = Seq(
      ("x", 10.0, Some("2026-01-01 00:00:00")),
      ("x", 30.0, Some("2026-01-01 01:00:00")),
      ("x", 10.0, Some("2026-01-02 00:00:00")),
      ("x", 60.0, Some("2026-01-02 01:00:00")),
      ("x", 999.0, Option.empty[String]),
      ("x", 998.0, Option.empty[String]))
      .toDF("g", "value", "ts")
    val out = graft.ops.Profile.driftSeries(rows, $"g", $"value",
        org.apache.spark.sql.functions.to_timestamp($"ts"),
        binWidth = 25.0, nBins = 4)
      .select("day", "drift").as[(java.sql.Date, Double)].collect()
    assert(out.length === 1 && out.head._1.toString === "2026-01-02")
    assert(out.head._2 > 0.0 && out.head._2 < 2.0)
  }

  test("law: skewReport orders a tied null key after non-null keys") {
    // DuckDB's ORDER BY defaults to NULLS LAST; the report's string
    // tie-break must agree or a boundary tie selects different rows
    val df = Seq(Some("a"), Some("a"), None, None, Some("b"))
      .toDF("k")
      .withColumn("row", org.apache.spark.sql.functions.lit(1L))
    val rep = graft.ops.Skew.skewReport(df, $"k", k = 3)
      .select("rank", "key_value").as[(Long, Option[String])].collect()
      .sortBy(_._1)
    assert(rep.map(_._2) === Array(Some("a"), None, Some("b")))
  }

  test("law: conform output schema equals the target schema, always") {
    import org.apache.spark.sql.types._
    val target = StructType(Seq(
      StructField("a", StringType), StructField("b", LongType),
      StructField("c", DoubleType)))
    samples(Gen.nonEmptyListOf(Gen.zip(Gen.alphaStr, Gen.alphaNumStr)), 5)
      .foreach { rows =>
        val df = rows.toDF("b", "x") // wrong-typed b, extra col, missing a/c
        val out = Normalize.conform(df, target)
        // names + types must match; conform's defaults tighten nullability
        assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
          target.fields.map(f => (f.name, f.dataType)).toSeq)
        assert(out.count() === rows.length)
      }
  }

  test("law: Aho–Corasick counts equal brute leftmost-non-overlap, always") {
    // pure-JVM differential: hundreds of adversarial cases (tiny
    // alphabet maximizes overlaps/self-overlaps) against a per-keyword
    // greedy reference scan — no Spark job per case
    def brute(text: String, kw: String): Long = {
      var i = 0; var n = 0L
      while (i <= text.length - kw.length) {
        if (text.regionMatches(i, kw, 0, kw.length)) { n += 1; i += kw.length }
        else i += 1
      }
      n
    }
    val kwGen = Gen.nonEmptyListOf(
      Gen.choose(1, 4).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', ' ')).map(_.mkString)))
      .map(_.distinct.take(8))
    val textGen = Gen.choose(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString))
    samples(Gen.zip(kwGen, Gen.listOfN(40, textGen)), 8).foreach {
      case (kws, texts) =>
        val ac = new graft.functions.AhoCorasick(kws)
        texts.foreach { t =>
          val got = ac.counts(t).toSeq
          val want = kws.map(brute(t, _))
          assert(got === want, s"kws=$kws text='$t'")
        }
    }
    // and one Spark pass so the CODEGEN path sees adversarial cases too
    val kws = Seq("ab", "aba", "a", "b b")
    val texts = samples(textGen, 30).toList
    val df = texts.toDF("t")
    val out = df.select(
      graft.functions.keywordCounts($"t", kws).as("fast"),
      graft.functions.keywordCountsCompositional($"t", kws).as("ref"))
      .collect()
    out.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("law: grid radius-nearest equals broadcast argmin filtered, always") {
    import org.apache.spark.sql.functions._
    val ptGen = for {
      id <- Gen.choose(1L, 500L)
      la <- Gen.choose(-33.0, 4.0); lo <- Gen.choose(-73.0, -35.0)
    } yield (id, la, lo)
    val (ptsRaw, csRaw) =
      samples(Gen.zip(Gen.listOfN(120, ptGen), Gen.listOfN(12, ptGen)), 1).head
    val pts = ptsRaw.distinctBy(_._1).toDF("id", "lat", "lon")
    val cs = csRaw.distinctBy(_._1).toDF("cid", "clat", "clon")
    for (r <- Seq(150.0, 700.0, 2500.0)) {
      val grid = graft.ops.Geo.nearestWithinRadius(pts, $"id", $"lat",
          $"lon", cs, $"cid", $"clat", $"clon", radiusKm = r,
          cosLat0 = 0.9692)
        .as[(Long, Long, Double)].collect().toSet
      val brute = graft.ops.Geo.nearestCentroid(pts, $"id", $"lat", $"lon",
          cs, $"cid", $"clat", $"clon", cosLat0 = 0.9692)
        .filter($"dist_km" <= r)
        .as[(Long, Long, Double)].collect().toSet
      assert(grid === brute, s"radius $r")
    }
  }

  test("law: QBIN quantile error is within one bin width, at any grid") {
    // random value multisets × random (lo, w, bins) grids: the
    // interpolated readout must sit within one bin width of the exact
    // ceil-rank quantile whenever the grid covers the data, because
    // the exact value lives inside the rank-holding bin — clamping
    // only widens the edge bins, which the covering grids avoid
    val caseGen = for {
      vals <- Gen.nonEmptyListOf(Gen.choose(0.0, 100.0))
      w <- Gen.oneOf(2.0, 5.0, 12.5, 25.0)
      lo <- Gen.oneOf(-10.0, 0.0)
    } yield (vals, lo, w)
    samples(caseGen, 6).foreach { case (vals, lo, w) =>
      val bins = math.ceil((100.0 - lo) / w).toInt + 1
      val qs = Seq(0.1, 0.5, 0.9, 1.0)
      val est = graft.ops.Sketch.qbinQuantiles(
          graft.ops.Sketch.qbinState(vals.toDF("v"), $"v", lo, w, bins),
          qs, lo, w)
        .as[(Double, Double)].collect().toMap
      val sorted = vals.sorted
      qs.foreach { q =>
        val exact = sorted(math.ceil(q * vals.size).toInt - 1)
        assert(math.abs(est(q) - exact) <= w + 1e-9,
          s"grid (lo=$lo, w=$w): q=$q est=${est(q)} exact=$exact on $vals")
      }
    }
  }
}
