package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Geo, Privacy, Train, Web}

/** Hand-checked laws for the round-9 surface: the Naive Bayes model
  * contract (Laplace floor, grid completeness, prior fallback), Platt
  * identities, the URL canonicalization rules one case at a time, the
  * registrable-domain suffix rule, and the governance-histogram mass
  * conservation laws.
  */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ——— Naive Bayes ————————————————————————————————————————————————————

  private def nbFixture = Seq(
    (0L, "en", "the cat sat"),
    (1L, "en", "the dog ran"),
    (2L, "es", "el gato corre"),
    (3L, "es", "el perro el"))
    .toDF("id", "lang", "text")

  test("naiveBayesModel: full class × vocab grid with the Laplace floor") {
    val m = Train.naiveBayesModel(nbFixture, $"lang", $"text")
    val rows = m.as[(String, String, Double, Double)].collect()
    // vocab = {the,cat,sat,dog,ran,el,gato,corre,perro} = 9; classes = 2
    assert(rows.length === 18)
    val byKey = rows.map(r => (r._1, r._2) -> r._3).toMap
    // es never saw "cat": floor ln(1/(6+9)) — es has 6 tokens, V=9
    assert(byKey(("es", "cat")) ===
      BigDecimal(math.log(1.0 / 15.0)).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    // "el" appears 3× in es: ln((3+1)/15)
    assert(byKey(("es", "el")) ===
      BigDecimal(math.log(4.0 / 15.0)).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    // priors: 2 docs each of 4 → ln(1/2), carried on every row
    val priors = rows.map(r => r._1 -> r._4).distinct
    assert(priors.toMap.values.toSet ===
      Set(BigDecimal(math.log(0.5)).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("naiveBayesScore: class-marker tokens decide; OOV docs fall back") {
    val m = Train.naiveBayesModel(nbFixture, $"lang", $"text")
    val test = Seq((10L, "el gato"), (11L, "the dog"), (12L, "zzz qqq"))
      .toDF("id", "text")
    val got = Train.naiveBayesScore(test, $"id", $"text", m)
      .select($"doc_id", $"pred_class", $"in_vocab")
      .as[(Long, String, Boolean)].collect().toSet
    // doc 12 has zero in-vocab tokens → max-prior class, tie broken by
    // class name ascending ('en' before 'es' at equal priors)
    assert(got === Set((10L, "es", true), (11L, "en", true),
      (12L, "en", false)))
  }

  test("naiveBayesModel: empty train → empty model; scoring still total") {
    val empty = nbFixture.filter($"id" < 0)
    val m = Train.naiveBayesModel(empty, $"lang", $"text")
    assert(m.count() === 0)
  }

  test("naiveBayesModel: minCount floors the vocab on the corpus count") {
    val m = Train.naiveBayesModel(nbFixture, $"lang", $"text", minCount = 2)
    // only "the" (2×) and "el" (3×) survive; 2 classes × 2 tokens
    val toks = m.select($"token").distinct().as[String].collect().toSet
    assert(toks === Set("the", "el"))
    assert(m.count() === 4)
  }

  test("naiveBayesState merge law: state(A ∪ B) = merge(state(A), state(B))") {
    val a = nbFixture.filter($"id" < 2)
    val b = nbFixture.filter($"id" >= 2)
    val merged = Train.naiveBayesMergeStates(
      Train.naiveBayesState(a, $"lang", $"text"),
      Train.naiveBayesState(b, $"lang", $"text"))
    val whole = Train.naiveBayesState(nbFixture, $"lang", $"text")
    val key = Seq("kind", "class", "token", "cnt")
    assert(merged.select(key.map(col): _*).collect().toSet ===
      whole.select(key.map(col): _*).collect().toSet)
    // and the model trained from the merged state is the batch model
    val mA = Train.naiveBayesFromState(merged)
      .as[(String, String, Double, Double)].collect().toSet
    val mB = Train.naiveBayesModel(nbFixture, $"lang", $"text")
      .as[(String, String, Double, Double)].collect().toSet
    assert(mA === mB)
  }

  // ——— Platt ——————————————————————————————————————————————————————————

  test("plattApply: zero weights give exactly ½; fit names are enforced") {
    val out = Seq((1L, 0.3), (2L, 0.9)).toDF("id", "s")
      .select(Train.plattApply($"s", Seq("bias" -> 0.0, "score" -> 0.0))
        .as("p")).as[Double].collect()
    assert(out.toSet === Set(0.5))
    intercept[IllegalArgumentException] {
      Train.plattApply($"s", Seq("a" -> 1.0, "b" -> 2.0))
    }
  }

  test("plattFit is exactly the 2-feature GD probe (shared device)") {
    val df = Seq((0.2, 0.0), (0.8, 1.0), (0.6, 1.0), (0.1, 0.0))
      .toDF("s", "y")
    val viaPlatt = Train.plattFit(df, $"s", $"y", iters = 2, rate = 0.5)
    val viaProbe = Train.linearProbeWeights(df, $"y",
      Seq("bias" -> lit(1.0d), "score" -> $"s"), iters = 2, rate = 0.5)
    assert(viaPlatt === viaProbe)
  }

  // ——— URL lane ———————————————————————————————————————————————————————

  private def canon(u: String): String =
    Seq(u).toDF("u").select(Web.urlCanonicalize($"u").as("c"))
      .as[String].head()

  test("urlCanonicalize: every rule, one case each") {
    // case-fold + www strip
    assert(canon("https://WWW.Example.COM/a") === "https://example.com/a")
    // fragment strip
    assert(canon("https://a.com/x#frag") === "https://a.com/x")
    // tracking params drop, remainder sorted
    assert(canon("https://a.com/x?utm_source=t&b=2&a=1&fbclid=z") ===
      "https://a.com/x?a=1&b=2")
    // all params tracking → no query at all
    assert(canon("https://a.com/x?utm_a=1&gclid=2&ref=3") ===
      "https://a.com/x")
    // trailing slash strip
    assert(canon("http://a.com/x/") === "https://a.com/x")
    // scheme normalized to https
    assert(canon("http://a.com/x") === "https://a.com/x")
    // bare host: empty path survives
    assert(canon("https://a.com") === "https://a.com")
  }

  test("registeredDomain: plain, second-level registry, passthrough") {
    val got = Seq("a.b.example.com", "news.bbc.co.uk", "x.com", "localhost")
      .toDF("h").select(Web.registeredDomain($"h").as("d"))
      .as[String].collect().toList
    assert(got === List("example.com", "bbc.co.uk", "x.com", "localhost"))
  }

  // ——— Governance histograms ——————————————————————————————————————————

  test("kAnonymityHistogram: mass conservation and the at-risk flag") {
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "x"), ("a", "x"), ("a", "x"),
      ("b", "x"), ("b", "x"), ("c", "y"))
      .toDF("qi1", "qi2")
    val h = Privacy.kAnonymityHistogram(df, Seq($"qi1", $"qi2"), k = 5)
      .as[(Long, Long, Long, Boolean)].collect().toList
    // groups: (a,x)=5, (b,x)=2, (c,y)=1 → sizes 1,2,5
    assert(h === List((1L, 1L, 1L, true), (2L, 1L, 2L, true),
      (5L, 1L, 5L, false)))
    // n_rows across the histogram = input rows
    assert(h.map(_._3).sum === 8L)
  }

  test("lDiversityHistogram: homogeneity is flagged even when k passes") {
    val df = Seq(
      // group (a): 5 rows, all sensitive=1 → k-anonymous, l = 1
      ("a", 1), ("a", 1), ("a", 1), ("a", 1), ("a", 1),
      // group (b): 2 rows, 2 distinct → l = 2
      ("b", 1), ("b", 2))
      .toDF("qi", "s")
    val h = Privacy.lDiversityHistogram(df, Seq($"qi"), $"s", l = 2)
      .as[(Long, Long, Long, Boolean)].collect().toList
    assert(h === List((1L, 1L, 5L, true), (2L, 1L, 2L, false)))
  }

  // ——— Geo ————————————————————————————————————————————————————————————

  test("nearestCentroid: hand-checked argmin with the min-cid tie-break") {
    // points on a line of latitude; centroids at lat 0, lon 0 / 10 / 20
    val pts = Seq((1L, 0.0, 1.0), (2L, 0.0, 9.0), (3L, 0.0, 16.0))
      .toDF("id", "lat", "lon")
    val cs = Seq((10L, 0.0, 0.0), (20L, 0.0, 10.0), (30L, 0.0, 20.0))
      .toDF("cid", "lat", "lon")
    val got = Geo.nearestCentroid(pts, $"id", $"lat", $"lon",
        cs, $"cid", $"lat", $"lon", cosLat0 = 1.0)
      .select($"point_id", $"centroid_id").as[(Long, Long)]
      .collect().toMap
    assert(got === Map(1L -> 10L, 2L -> 20L, 3L -> 30L))
    // exact tie (lon 5 between centroids 0 and 10) → smaller cid wins
    val tie = Seq((9L, 0.0, 5.0)).toDF("id", "lat", "lon")
    val t = Geo.nearestCentroid(tie, $"id", $"lat", $"lon",
        cs, $"cid", $"lat", $"lon", cosLat0 = 1.0)
      .select($"centroid_id").as[Long].head()
    assert(t === 10L)
  }

  test("nearestWithinRadius containment law: grid ≡ broadcast argmin ≤ R") {
    // the q314/q315 coordinate synthesis at sf0.001 scale
    val spark0 = spark
    import spark0.implicits._
    val pts = (1L to 400L).toDF("id")
      .select($"id", Geo.synthLat($"id").as("lat"),
        Geo.synthLon($"id").as("lon"))
    val cs = (0L to 24L).toDF("cid")
      .select($"cid",
        Geo.synthLat(concat(lit("n"), $"cid".cast("string"))).as("lat"),
        Geo.synthLon(concat(lit("n"), $"cid".cast("string"))).as("lon"))
    val r = 500.0
    val grid = Geo.nearestWithinRadius(pts, $"id", $"lat", $"lon",
        cs, $"cid", $"lat", $"lon", radiusKm = r, cosLat0 = 0.9692)
      .as[(Long, Long, Double)].collect().toSet
    val brute = Geo.nearestCentroid(pts, $"id", $"lat", $"lon",
        cs, $"cid", $"lat", $"lon", cosLat0 = 0.9692)
      .filter($"dist_km" <= r)
      .as[(Long, Long, Double)].collect().toSet
    assert(grid === brute)
    assert(grid.nonEmpty && grid.size < 400) // both regimes exercised
  }

  test("pointInPolygon: square, L-shape concavity, horizontal edges") {
    // (lat, lon) squares/L-shapes; horizontal edges are skipped by the
    // crossing rule and must not break containment
    val square = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))
    // L-shape: the notch (lat>5, lon>5) is OUTSIDE
    val ell = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 5.0), (5.0, 5.0),
      (5.0, 10.0), (0.0, 10.0))
    val pts = Seq(
      (1L, 5.0, 5.0 - 0.5),   // inside both
      (2L, 15.0, 5.0),        // above both
      (3L, 5.0, -1.0),        // left of both
      (4L, 7.0, 7.0),         // inside square, in the L's notch
      (5L, 2.0, 7.0))         // inside both (below the notch)
      .toDF("id", "la", "lo")
    val got = pts.select($"id",
        Geo.pointInPolygon($"la", $"lo", square).as("sq"),
        Geo.pointInPolygon($"la", $"lo", ell).as("el"))
      .as[(Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) === (true, true))
    assert(got(2L) === (false, false))
    assert(got(3L) === (false, false))
    assert(got(4L) === (true, false))
    assert(got(5L) === (true, true))
  }

  // ——— DoReMi-lite ————————————————————————————————————————————————————

  test("domainMixWeights: uniform losses → uniform weights, full budget") {
    val d = Seq(("a", 0.5), ("b", 0.5), ("c", 0.5), ("d", 0.5))
      .toDF("dom", "l")
    val w = Train.domainMixWeights(d, $"dom", $"l", eta = 10.0, eps = 0.1,
        tokenBudget = 1000000L)
      .as[(String, Double, Double, Double, Long)].collect().toList.sorted
    assert(w.forall(_._3 === 0.0)) // zero excess everywhere
    assert(w.forall(_._4 === 0.25))
    assert(w.map(_._5).sum === 1000000L)
  }

  test("domainMixWeights: excess clamps at zero and upweights hard domains") {
    val d = Seq(("easy", 0.1), ("mid", 0.3), ("hard", 0.8))
      .toDF("dom", "l")
    val w = Train.domainMixWeights(d, $"dom", $"l", eta = 10.0, eps = 0.1,
        tokenBudget = 1000000L)
      .as[(String, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    // ref = 0.4: easy and mid are below → excess 0; hard is 0.4 over
    assert(w("easy")._3 === 0.0 && w("mid")._3 === 0.0)
    assert(w("hard")._3 === 0.4)
    assert(w("hard")._4 > w("mid")._4 && w("mid")._4 === w("easy")._4)
    // weights sum to 1 within the 6-dp rounding
    assert(math.abs(w.values.map(_._4).sum - 1.0) < 1e-5)
  }

  test("domainMixWeights: one domain → weight 1, whole budget; empty → empty") {
    val one = Train.domainMixWeights(Seq(("only", 0.7)).toDF("d", "l"),
        $"d", $"l", eta = 10.0, eps = 0.1, tokenBudget = 500L)
      .as[(String, Double, Double, Double, Long)].head()
    assert(one._3 === 0.0 && one._4 === 1.0 && one._5 === 500L)
    val none = Train.domainMixWeights(
      Seq.empty[(String, Double)].toDF("d", "l"),
      $"d", $"l", eta = 10.0, eps = 0.1, tokenBudget = 500L)
    assert(none.count() === 0)
  }

  // ——— Encoding anomalies —————————————————————————————————————————————

  test("encodingAnomalies: hand-checked counts, ratio, and flag rule") {
    val df = Seq(
      (1L, "clean plain text"),
      (2L, "donâ€™t cafÃ© cafÃ©"),   // 1 smart quote + 2 mojibake é
      (3L, "bad\uFFFDbyte"),          // replacement char → always flagged
      (4L, ""))                       // empty → ratio 0, unflagged
      .toDF("id", "txt")
    val got = graft.ops.TextAnalysis
      .encodingAnomalies(df, $"id", $"txt")
      .as[(Long, Int, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._3 === 0L && got(1L)._4 === 0L && !got(1L)._6)
    assert(got(2L)._3 === 0L && got(2L)._4 === 3L && got(2L)._6)
    assert(got(3L)._3 === 1L && got(3L)._6)
    assert(got(4L)._2 === 0 && got(4L)._5 === 0.0 && !got(4L)._6)
  }
}
