package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Eval, Geo, Sketch, Train, Web}

/** Round-10 ADVICE closures, pinned as laws:
  *  - the Naive Bayes vocab-floor mass law (pruned tokens leave the
  *    Laplace denominator, so smoothed probabilities over the retained
  *    vocab sum to 1 at ANY minCount);
  *  - the URL canonicalization edge rules (bare tracking params drop;
  *    schemeless input yields NULL, never a shared junk key);
  *  - keyword_counts' clean plan-time error on NULL keyword elements.
  */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ——— Naive Bayes vocab floor ————————————————————————————————————————

  test("naiveBayesFromState: minCount prunes mass from the denominator") {
    // corpus counts: "the"=3, "cat"=2, "rare"=1 — minCount=2 drops "rare"
    val df = Seq(
      (0L, "a", "the the cat rare"),
      (1L, "a", "the cat"),
      (2L, "b", "the"))
      .toDF("id", "lang", "text")
    val m = Train.naiveBayesModel(df, $"lang", $"text", minCount = 2)
    val rows = m.as[(String, String, Double, Double)].collect()
    // grid = 2 classes × 2 retained tokens
    assert(rows.map(r => (r._1, r._2)).toSet ===
      Set(("a", "the"), ("a", "cat"), ("b", "the"), ("b", "cat")))
    val byKey = rows.map(r => (r._1, r._2) -> r._3).toMap
    // class a retained-token total = the(3) + cat(2) = 5 (NOT 6 — the
    // pruned "rare" count must leave the denominator), V = 2:
    // p(the|a) = 4/7, p(cat|a) = 3/7
    def ln9(x: Double) = BigDecimal(math.log(x))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byKey(("a", "the")) === ln9(4.0 / 7.0))
    assert(byKey(("a", "cat")) === ln9(3.0 / 7.0))
    // class b: the(1), cat(0) → totals 1, denominators 1+2
    assert(byKey(("b", "the")) === ln9(2.0 / 3.0))
    assert(byKey(("b", "cat")) === ln9(1.0 / 3.0))
    // mass law: per class, Σ_vocab (cnt+1)/(ctok+V) = 1 exactly
    for (c <- Seq("a", "b")) {
      val mass = rows.filter(_._1 == c).map(r => math.exp(r._3)).sum
      assert(math.abs(mass - 1.0) < 1e-8,
        s"class $c smoothed mass over retained vocab = $mass, want 1")
    }
  }

  test("naiveBayesModel: minCount=1 keeps the round-9 gated arithmetic") {
    // identity at the gated floor: the vocab join changes nothing
    val df = Seq((0L, "en", "the cat"), (1L, "es", "el gato"))
      .toDF("id", "lang", "text")
    val m = Train.naiveBayesModel(df, $"lang", $"text")
    val byKey = m.as[(String, String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    def ln9(x: Double) = BigDecimal(math.log(x))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // en: 2 tokens, V=4 → p(the|en) = 2/6
    assert(byKey(("en", "the")) === ln9(2.0 / 6.0))
    assert(byKey(("en", "el")) === ln9(1.0 / 6.0))
  }

  // ——— URL canonicalization edges —————————————————————————————————————

  test("urlCanonicalize: bare (valueless) tracking params drop") {
    val got = Seq(
      "https://a.com/x?fbclid",
      "https://a.com/x?utm_source",
      "https://a.com/x?fbclid&id=1",
      "https://a.com/x?ref")
      .toDF("url").select(Web.urlCanonicalize($"url")).as[String]
      .collect()
    assert(got.toSeq === Seq("https://a.com/x", "https://a.com/x",
      "https://a.com/x?id=1", "https://a.com/x"))
    // and a param that merely STARTS like a tracker is NOT dropped
    val kept = Seq("https://a.com/x?reference=2").toDF("url")
      .select(Web.urlCanonicalize($"url")).as[String].head()
    assert(kept === "https://a.com/x?reference=2")
  }

  test("urlCanonicalize: schemeless/relative input yields NULL") {
    val got = Seq("example.com/x", "/relative/path", "", "ftp+x")
      .toDF("url")
      .select(Web.urlCanonicalize($"url").as("c"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.forall(_.isEmpty),
      s"malformed URLs must canonicalize to NULL, got ${got.mkString(",")}")
    // absolute URLs are unaffected
    val ok = Seq("http://WWW.A.com/x/").toDF("url")
      .select(Web.urlCanonicalize($"url")).as[String].head()
    assert(ok === "https://a.com/x")
  }

  // ——— zone-table point-in-polygon ————————————————————————————————————

  /** The q321 zone literals (duplicated here as the spec's own fixture —
    * non-convex, horizontal edges included).
    */
  private val zones3: Seq[(String, Seq[(Double, Double)])] = Seq(
    "zone_north" -> Seq((4.0, -70.0), (4.0, -50.0), (-5.0, -45.0),
      (-5.0, -72.0)),
    "zone_coast" -> Seq((-3.0, -34.9), (-15.0, -36.0), (-10.0, -45.0)),
    "zone_south" -> Seq((-20.0, -58.0), (-22.0, -45.0), (-30.0, -50.0),
      (-33.0, -55.0), (-25.0, -60.0)))

  test("zoneTagJoin: data-edge arithmetic equals the literal expression") {
    // a dense deterministic point grid spanning the zones' extent
    val pts = spark.range(0, 900).select($"id",
      (lit(-34.0) + ($"id" % 30).cast("double") * 1.35).as("plat"),
      (lit(-73.5) + ($"id" / 30).cast("double") * 1.32).as("plon"))
      .localCheckpoint()
    val zones = zones3.toDF("zone", "__vs")
      .select($"zone", transform($"__vs", v =>
        struct(v.getField("_1").as("lat"), v.getField("_2").as("lon")))
        .as("verts"))
    val viaTable = Geo.zoneTagJoin(pts, $"id", $"plat", $"plon",
        zones, $"zone", $"verts", cellKm = 400.0, cosLat0 = 0.9692)
      .as[(Long, String)].collect().toSet
    val viaLiteral = zones3.flatMap { case (name, poly) =>
      pts.filter(Geo.pointInPolygon($"plat", $"plon", poly))
        .select($"id").as[Long].collect().map(_ -> name)
    }.toSet
    assert(viaTable === viaLiteral,
      s"table-driven and literal containment disagree: " +
        s"only-table=${(viaTable -- viaLiteral).take(5)} " +
        s"only-literal=${(viaLiteral -- viaTable).take(5)}")
    assert(viaLiteral.nonEmpty, "no point landed in any zone — vacuous")
  }

  test("zoneTagJoin: overlapping zones emit one pair each") {
    val zones = Seq(
      ("za", Seq((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0))),
      ("zb", Seq((5.0, 5.0), (5.0, 15.0), (15.0, 15.0), (15.0, 5.0))))
      .toDF("zone", "__vs")
      .select($"zone", transform($"__vs", v =>
        struct(v.getField("_1").as("lat"), v.getField("_2").as("lon")))
        .as("verts"))
    val pts = Seq((1L, 7.0, 7.0), (2L, 2.0, 2.0), (3L, 20.0, 20.0))
      .toDF("id", "plat", "plon")
    val got = Geo.zoneTagJoin(pts, $"id", $"plat", $"plon", zones,
        $"zone", $"verts", cellKm = 300.0, cosLat0 = 1.0)
      .as[(Long, String)].collect().toSet
    assert(got === Set((1L, "za"), (1L, "zb"), (2L, "za")))
  }

  // ——— PSL-table registrable domain ———————————————————————————————————

  test("registeredDomainPsl: longest match, '*' default, suffix→NULL") {
    val psl = Web.pslSuffixes.toDF("suffix")
    val hosts = Seq(
      (0L, "a.b.example.com"),        // k=1 'com' → example.com
      (1L, "news.bbc.co.uk"),         // k=2 'co.uk' → bbc.co.uk
      (2L, "x.schools.k12.ca.us"),    // k=3 beats k=1 'us' → schools.k12.ca.us
      (3L, "portal.gov.br"),          // k=2 'gov.br' (not in the literal list)
      (4L, "startup.xyz"),            // no rule → '*' default → startup.xyz
      (5L, "com.br"),                 // host IS a suffix → NULL
      (6L, "localhost"))              // single label, no rule → NULL
      .toDF("id", "host")
    val got = Web.registeredDomainPsl(hosts, $"id", $"host", psl)
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(got === Map(
      0L -> Some("example.com"), 1L -> Some("bbc.co.uk"),
      2L -> Some("schools.k12.ca.us"), 3L -> Some("portal.gov.br"),
      4L -> Some("startup.xyz"), 5L -> None, 6L -> None))
  }

  test("registeredDomainPsl: wildcard and exception rules (PSL spec)") {
    val psl = Web.pslSuffixes.toDF("suffix") // carries *.ck and !www.ck
    val hosts = Seq(
      (0L, "shop.ck"),        // '*' label itself IS a suffix → NULL
      (1L, "x.shop.ck"),      // under the wildcard suffix → x.shop.ck
      (2L, "a.x.shop.ck"),    // deeper → still x.shop.ck
      (3L, "www.ck"),         // exception beats the wildcard → www.ck
      (4L, "y.www.ck"),       // exception's suffix is 'ck' → www.ck
      (5L, "ck"),             // bare wildcard tail: no wildcard match,
                              //   single label → NULL
      (6L, "b.net.kawasaki.jp")) // *.kawasaki.jp beats plain co.jp-style
      .toDF("id", "host")
    val got = Web.registeredDomainPsl(hosts, $"id", $"host", psl)
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(got === Map(
      0L -> None, 1L -> Some("x.shop.ck"), 2L -> Some("x.shop.ck"),
      3L -> Some("www.ck"), 4L -> Some("www.ck"), 5L -> None,
      6L -> Some("b.net.kawasaki.jp")))
  }

  test("registeredDomainPsl: property law vs a reference implementation") {
    // independent reference: the PSL algorithm in plain Scala — match a
    // rule when the host ends with its labels (wildcard consuming one
    // extra), exception-first-then-longest winner, '*' default
    def ref(host: String, rules: Seq[String]): Option[String] = {
      val ls = host.split('.').toSeq
      def tail(k: Int) = ls.takeRight(k).mkString(".")
      val hits = rules.flatMap { r =>
        val (kind, key) =
          if (r.startsWith("!")) (2, r.drop(1))
          else if (r.startsWith("*.")) (1, r.drop(2)) else (0, r)
        val kl = key.split('.').length
        val matches = ls.length >= kl && tail(kl) == key &&
          (kind != 1 || ls.length >= kl + 1)
        if (!matches) None
        else {
          val effLen = kind match {
            case 0 => kl case 1 => kl + 1 case _ => kl - 1
          }
          val reg = kind match {
            case 2 => Some(tail(kl))
            case _ => if (ls.length >= effLen + 1) Some(tail(effLen + 1))
                      else None
          }
          Some((if (kind == 2) 1 else 0, effLen, reg))
        }
      }
      if (hits.nonEmpty) {
        // exception first, then longest effective suffix (regs agree at
        // ties by construction — same effLen ⇒ same label count)
        hits.maxBy(h => (h._1, h._2))._3
      } else if (ls.length >= 2) Some(tail(2)) else None
    }
    // ~400 deterministic pseudo-random hosts over a label alphabet that
    // collides with every rule form in the table
    val rnd = new scala.util.Random(42)
    val alpha = Seq("www", "a", "b7", "shop", "mall", "ck", "co", "uk",
      "com", "br", "xyz", "k12", "ca", "us", "kawasaki", "jp", "edu")
    val hosts = (0 until 400).map { i =>
      val n = 1 + rnd.nextInt(5)
      (i.toLong, Seq.fill(n)(alpha(rnd.nextInt(alpha.size))).mkString("."))
    }
    val psl = Web.pslSuffixes.toDF("suffix")
    val got = Web.registeredDomainPsl(hosts.toDF("id", "host"),
        $"id", $"host", psl)
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    val bad = hosts.filter { case (id, h) =>
      got(id) != ref(h, Web.pslSuffixes)
    }
    assert(bad.isEmpty, s"engine vs reference diverge on: " +
      bad.take(5).map { case (id, h) =>
        s"$h engine=${got(id)} ref=${ref(h, Web.pslSuffixes)}"
      }.mkString("; "))
    // non-vacuous: the draw hit wildcard, exception and default paths
    assert(hosts.exists(h => h._2.endsWith(".ck") &&
      !h._2.endsWith("www.ck") && h._2.split('.').length >= 3))
    assert(hosts.exists(_._2.endsWith("www.ck")))
  }

  test("registeredDomainPsl agrees with the literal rule on its shapes") {
    // on hosts whose suffixes both rules know, table and literal agree —
    // the q307-compatibility law that let the round-9 oracle stand
    val psl = Web.pslSuffixes.toDF("suffix")
    val hosts = (0L until 12L).map { i =>
      val sfx = Web.secondLevelSuffixes(i.toInt % Web.secondLevelSuffixes.size)
      (i, s"h$i.site$i.$sfx")
    }.toDF("id", "host")
    val table = Web.registeredDomainPsl(hosts, $"id", $"host", psl)
      .select($"id", $"registered_domain")
    val literal = hosts.select($"id",
      Web.registeredDomain($"host").as("lit_domain"))
    val diff = table.join(literal, Seq("id"))
      .filter(!($"registered_domain" <=> $"lit_domain")).count()
    assert(diff === 0L)
  }

  // ——— model-based curation (q322's device) ———————————————————————————

  test("model filter recovers the plant where the heuristic cannot") {
    import graft.ops.TextAnalysis
    // the q322 rule on a hand-built corpus: ids ≡ 0 (mod 5) get the spam
    // tail and the 'low' label; unplanted doc 7 is a long, high-quality
    // text the heuristic keeps — and doc 0's planted twin keeps the SAME
    // high-quality body, so the heuristic keeps it too while the model
    // must drop it: a guaranteed disagreement in BOTH directions is
    // impossible (the heuristic can't see labels), one direction is the
    // non-vacuousness q322 gates
    val body = ("carefully reviewed thorough analysis presented with " +
      "ample detail and clear structured argument spanning topics ") * 3
    val docs = (0L until 20L).map { i =>
      val tail = if (i % 5 == 0)
        " click here buy now free offer limited deal click here buy now"
      else ""
      (i, body + i.toString + tail, if (i % 5 == 0) "low" else "high")
    }.toDF("doc_id", "text", "label")
    val model = Train.naiveBayesModel(
      docs.filter($"doc_id" % 2 === 0), $"label", $"text")
    val scored = Train.naiveBayesScore(docs, $"doc_id", $"text", model)
      .join(docs.select($"doc_id", $"label",
        (round(TextAnalysis.qualityScore($"text"), 4) >= 0.5)
          .as("heur_keep")), Seq("doc_id"))
    val rows = scored.select($"doc_id", $"pred_class", $"label",
        $"heur_keep").as[(Long, String, String, Boolean)].collect()
    // the model recovers every planted label, train and held-out alike
    assert(rows.forall(r => r._2 == r._3),
      s"NB failed to recover the plant: ${rows.filter(r => r._2 != r._3).mkString(",")}")
    // and disagrees with the heuristic on every planted doc (the
    // heuristic keeps the high-quality body regardless of the spam tail)
    val disagree = rows.filter(r => (r._2 == "high") != r._4)
    assert(disagree.nonEmpty, "model and heuristic never disagree — " +
      "the q322 swap would be vacuous")
    assert(disagree.forall(_._3 == "low"))
  }

  test("q328: the model language gate beats the marker heuristic") {
    // the gated rollup itself, read at sf0.001: the swap is non-vacuous
    // (model and heuristic disagree somewhere) AND the learned gate's
    // report card against the true lang label beats the rule's
    val out = SparkEntry.queries("q328_model_lang_gate")(
      spark, "/root/testdata/sf0.001")
    val (dis, mOk, hOk) = out.agg(
        sum($"n_disagree"), sum($"n_model_correct"), sum($"n_heur_correct"))
      .as[(Long, Long, Long)].head()
    assert(dis > 0, "model and heuristic language gates never disagree — " +
      "the q328 swap would be vacuous")
    assert(mOk > hOk,
      s"trained gate ($mOk correct) does not beat the marker rule ($hOk)")
  }

  // ——— OLAP decorrelation devices (q330/q331) ————————————————————————

  test("q330 device: the max-probe equi-join preserves decimal ties") {
    // two suppliers tied at the max: the classic correlated form keeps
    // both; the broadcast equi-join decorrelation must too
    val rev = Seq((1L, "3.10"), (2L, "5.00"), (3L, "5.00"), (4L, "0.70"))
      .toDF("k", "r").select($"k", $"r".cast("decimal(18,6)").as("r"))
    val mx = rev.agg(max($"r").as("mx"))
    val top = rev.join(broadcast(mx), $"r" === $"mx")
      .select($"k").as[Long].collect().sorted
    assert(top === Array(2L, 3L), s"tie not preserved: ${top.mkString(",")}")
  }

  test("q331 device: the decimal threshold is exact at the boundary") {
    // vals 1,2,3 → total 6, n 3, avg 2, 1.5·avg = 3: the val-3 part sits
    // EXACTLY at the threshold and the strict > must exclude it — no
    // float drift may nudge a borderline part across
    def pass(vals: Seq[String]): Seq[Long] = {
      val pv = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("p", "v").select($"p", $"v".cast("decimal(26,2)").as("v"))
      val st = pv.agg(sum($"v").cast("decimal(26,2)").as("t"),
        count(lit(1)).cast("decimal(8,0)").as("np"))
      pv.crossJoin(broadcast(st))
        .filter($"v" * lit(2) * $"np" > $"t" * lit(3))
        .select($"p").as[Long].collect().toSeq.sorted
    }
    assert(pass(Seq("1.00", "2.00", "3.00")).isEmpty,
      "a part exactly AT 1.5×avg leaked through the strict compare")
    // and one clearly above it passes: 4 > 1.5·2 on total 6, n 3
    assert(pass(Seq("1.00", "1.00", "4.00")) === Seq(2L))
  }

  // ——— fixed-bin quantile sketch (q335's device) ——————————————————————

  test("qbinState: state(A ⊎ B) equals merge(state(A), state(B))") {
    val a = Seq(1.0, 5.0, 9.5, 22.0).toDF("v")
    // −3 clamps into bin 0, 100 into the top bin — the edge rule merges
    // identically on both paths
    val b = Seq(5.5, 9.9, 100.0, -3.0).toDF("v")
    def bins(df: org.apache.spark.sql.DataFrame) =
      Sketch.qbinState(df, $"v", lo = 0.0, w = 2.0, bins = 8)
    val whole = bins(a.union(b))
      .as[(Long, Long)].collect().toSet
    val merged = Sketch.qbinMergeStates(bins(a), bins(b))
      .as[(Long, Long)].collect().toSet
    assert(whole === merged, s"merge law violated: $whole vs $merged")
  }

  test("qbinQuantiles: within one bin width of exact; empty state → no rows") {
    // seeded spread over [0, 100]: (i·37) mod 101 cycles the range
    val vals = (0 until 400).map(i => ((i * 37) % 101).toDouble)
    val df = vals.toDF("v")
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    val est = Sketch.qbinQuantiles(
        Sketch.qbinState(df, $"v", lo = 0.0, w = 5.0, bins = 32),
        qs, lo = 0.0, w = 5.0)
      .as[(Double, Double)].collect().toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      // exact rank-q value (ceil convention — the smallest value whose
      // cumulative count reaches q·N, the sketch's own rank rule)
      val exact = sorted(math.ceil(q * vals.size).toInt - 1)
      assert(math.abs(est(q) - exact) <= 5.0 + 1e-9,
        s"q=$q: est=${est(q)} vs exact=$exact drifted past one bin width")
    }
    val empty = Sketch.qbinQuantiles(
      Sketch.qbinState(df.filter($"v" < -1), $"v", 0.0, 5.0, 32),
      qs, 0.0, 5.0)
    assert(empty.count() === 0L, "empty state must read out as no rows")
  }

  test("qbinQuantilesBy: each group reads as if sketched alone") {
    // group independence — the grouped readout for g must equal the
    // ungrouped sketch run on g's rows alone, for every group
    val df = (0 until 300).map { i =>
      (s"g${i % 3}", ((i * 37) % 101).toDouble)
    }.toDF("g", "v")
    val grouped = Sketch.qbinQuantilesBy(
        Sketch.qbinStateBy(df, $"g", $"v", lo = 0.0, w = 5.0, bins = 32),
        Seq(0.5, 0.9), lo = 0.0, w = 5.0)
      .as[(String, Double, Double)].collect().toSet
    val solo = (0 until 3).flatMap { g =>
      Sketch.qbinQuantiles(
          Sketch.qbinState(df.filter($"g" === s"g$g"), $"v",
            lo = 0.0, w = 5.0, bins = 32),
          Seq(0.5, 0.9), lo = 0.0, w = 5.0)
        .as[(Double, Double)].collect().map { case (q, e) => (s"g$g", q, e) }
    }.toSet
    assert(grouped === solo,
      s"grouped readout drifted from the solo sketches: $grouped vs $solo")
  }

  // ——— streamed crawl frontier (q332's device) ————————————————————————

  test("frontierMaintain: first batch wins and a second drain is a no-op") {
    val stage = java.nio.file.Files.createTempDirectory("graft_fm_spec")
    try {
      val src = stage.resolve("src").toString
      // batch 0: two raw spellings of one canonical target (keeper =
      // min id) plus a non-absolute input (NULL canonical — dropped)
      Seq((1L, "https://A.example.com/x/"),
          (2L, "https://a.example.com/x"),
          (3L, "relative/path"))
        .toDF("doc_id", "url")
        .repartition(1).write.mode("append").parquet(src)
      def files = new java.io.File(src).listFiles
        .filter(_.getName.endsWith(".parquet"))
      val base = files.map(_.lastModified).max
      val f0 = files.map(_.getName).toSet
      // batch 1: a redelivery of the claimed key (tracking-param
      // variant) and one genuinely new key
      Seq((10L, "https://a.example.com/x?utm_source=z"),
          (11L, "https://b.example.com/y"))
        .toDF("doc_id", "url")
        .repartition(1).write.mode("append").parquet(src)
      files.filterNot(f => f0.contains(f.getName))
        .foreach(_.setLastModified(base + 120000L))
      val schema = spark.read.parquet(src).schema
      val state = stage.resolve("state").toString
      val ckpt = stage.resolve("ckpt").toString
      def drain(): Unit = graft.streaming.Streaming.frontierMaintain(
        spark, src, schema, "doc_id", "url", state, ckpt)
      drain()
      def claims() = spark.read.parquet(s"$state/claims")
        .select($"canon", $"doc_id", $"__batch_id".cast("long"))
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
      val first = claims()
      assert(first === Seq(
        ("https://a.example.com/x", 1L, 0L),
        ("https://b.example.com/y", 11L, 1L)),
        s"frontier law violated: $first")
      drain() // nothing new: the checkpoint must skip everything
      assert(claims() === first, "a no-new-files drain mutated the frontier")
    } finally {
      org.apache.spark.network.util.JavaUtils
        .deleteRecursively(stage.toFile)
    }
  }

  // ——— mergeable calibration state (q326's device) ————————————————————

  test("calibState: state(A ∪ B) equals merge(state(A), state(B))") {
    val mk = (rows: Seq[(Double, Boolean)]) =>
      rows.toDF("s", "p")
    val a = mk(Seq((0.05, false), (0.12, false), (0.33, true),
      (0.41, false), (0.77, true)))
    val b = mk(Seq((0.08, true), (0.33, false), (0.95, true),
      (0.95, false), (0.51, true)))
    val whole = Eval.calibState(a.unionByName(b), $"s", $"p", bins = 4)
    val merged = Eval.calibMergeStates(
      Eval.calibState(a, $"s", $"p", bins = 4),
      Eval.calibState(b, $"s", $"p", bins = 4))
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDecimal(3), r.getDecimal(4))).sortBy(_._1).toSeq
    assert(key(whole) === key(merged))
    // state is bounded by the bin count, never the row count
    assert(whole.count() <= 4)
  }

  test("calibState: global Brier recovers exactly from the bin state") {
    val df = (0L until 50L).map(i =>
      (i, (i % 10) / 10.0 + 0.05, i % 3 == 0)).toDF("id", "s", "p")
    val fromState = Eval.calibState(df, $"s", $"p", bins = 10)
      .agg(sum($"brier_sum").cast("decimal(28,18)")).head().getDecimal(0)
    val direct = df.select(
        ((round($"s", 9).cast("decimal(10,9)") -
          when($"p", 1).otherwise(0).cast("decimal(10,9)")) *
         (round($"s", 9).cast("decimal(10,9)") -
          when($"p", 1).otherwise(0).cast("decimal(10,9)")))
          .cast("decimal(28,18)").as("sq"))
      .agg(sum($"sq").cast("decimal(28,18)")).head().getDecimal(0)
    assert(fromState.compareTo(direct) === 0)
  }

  test("calibStateBins: edge scores clamp into the boundary bins") {
    val df = Seq((-0.2, false), (0.0, false), (0.5, true), (1.0, true),
      (1.3, true)).toDF("s", "p")
    val bins = Eval.calibState(df, $"s", $"p", bins = 10)
      .select($"bin", $"n").as[(Long, Long)].collect().toMap
    assert(bins(0L) === 2L) // -0.2 clamps up into bin 0
    assert(bins(9L) === 2L) // 1.0 and 1.3 clamp down into bin 9
    assert(bins(5L) === 1L)
  }

  // ——— keyword_counts SQL registration ———————————————————————————————

  test("keyword_counts SQL: NULL keyword element raises the clean error") {
    graft.functions.registerAll(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT keyword_counts('abc', array('a', NULL))").collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("foldable string-array keyword list")),
      s"expected the clean IllegalArgumentException, got $e")
    assert(!chain(e).exists(_.isInstanceOf[NullPointerException]))
  }
}
