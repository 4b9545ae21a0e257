package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"), // near-dup of 1
    (3L, "completely different content about spark query engines at scale"),
    (4L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
    (5L, "short")).toDF("doc_id", "text")

  test("exactByHash groups identical content") {
    val out = Dedup.exactByHash(docs, $"text", $"doc_id")
      .filter($"n_copies" > 1).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("keep_id") === 1L)
    assert(out(0).getAs[Long]("n_copies") === 2L)
  }

  test("minhashLshPairs finds near-dups and exact dups, not distinct docs") {
    val pairs = Dedup.minhashLshPairs(docs, $"doc_id", $"text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 4L))) // near-dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // distinct doc clean
  }

  test("ngramJaccardPairs computes exact set similarity") {
    val out = Dedup.ngramJaccardPairs(docs, $"doc_id", $"text",
      Seq(lit(1)), minJaccard = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 4L)))
  }

  test("hashed-shingle jaccard equals string-shingle jaccard") {
    // include a second shingle-less doc: a pair of empty sets must not
    // score 1.0 in either mode
    val withShort = docs.union(Seq((6L, "tiny too")).toDF("doc_id", "text"))
    val str = Dedup.ngramJaccardPairs(withShort, $"doc_id", $"text", Seq(lit(1)))
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val hashed = Dedup.ngramJaccardPairs(withShort, $"doc_id", $"text", Seq(lit(1)),
      hashedShingles = true)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(hashed === str)
    assert(!str.contains((5L, 6L, 1.0)))
  }

  test("inverted-index jaccard agrees with the all-pairs version") {
    val dense = Dedup.ngramJaccardPairs(docs, $"doc_id", $"text", Seq(lit(1)))
      .filter($"jaccard" > 0)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    val inverted = Dedup.ngramJaccardPairsInverted(docs, $"doc_id", $"text", Seq(lit(1)))
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    assert(inverted === dense)
  }

  test("simhash is identical for identical docs and close for near-dups") {
    val hashes = Dedup.simhash(docs, $"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) === hashes(4L))
    val hamming = java.lang.Long.bitCount(hashes(1L) ^ hashes(2L))
    assert(hamming <= 16, s"near-dup hamming distance was $hamming")
    assert(java.lang.Long.bitCount(hashes(1L) ^ hashes(3L)) > hamming)
  }

  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), 0),
    (2L, Array(0.9f, 0.1f, 0.0f), 0),  // close to 1
    (3L, Array(0.0f, 1.0f, 0.0f), 0),  // orthogonal to 1
    (4L, Array(-1.0f, 0.0f, 0.0f), 1)) // opposite, other label
    .toDF("vec_id", "embedding", "label")

  test("cosineNearDupPairs respects blocking and threshold") {
    val out = Dedup.cosineNearDupPairs(vecs, $"vec_id", $"embedding",
      Seq($"label"), minCosine = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)))
  }

  test("bruteForceTopK ranks by cosine") {
    val out = Similarity.bruteForceTopK(vecs, $"vec_id", $"embedding",
      vecs.filter($"vec_id" === 1), $"vec_id", $"embedding", k = 2)
      .orderBy("rank").select("item_id").as[Long].collect()
    assert(out.toSeq === Seq(2L, 3L)) // closest first; id 4 (cos=-1) excluded
  }

  test("lshTopK only searches the query's sign bucket") {
    val out = Similarity.lshTopK(vecs, $"vec_id", $"embedding",
      vecs.filter($"vec_id" === 1), $"vec_id", $"embedding",
      k = 5, dims = Seq(0))
    // vec 4 has a negative first coordinate -> different bucket -> excluded
    assert(!out.select("item_id").as[Long].collect().contains(4L))
  }

  test("assignToCentroids puts each item in its nearest cell") {
    val centroids = Seq((10L, Array(1.0f, 0.0f, 0.0f)),
      (20L, Array(0.0f, 1.0f, 0.0f))).toDF("cell", "vec")
    val out = Similarity.assignToCentroids(vecs, $"vec_id", $"embedding",
      centroids, $"cell", $"vec")
      .select("item_id", "cell").as[(Long, Long)].collect().toMap
    assert(out(1L) === 10L && out(2L) === 10L && out(3L) === 20L)
  }

  test("recomputeCentroids + centroidsAsVectors support a second k-means round") {
    val centroids = Seq((10L, Array(1.0f, 0.0f, 0.0f)),
      (20L, Array(0.0f, 1.0f, 0.0f))).toDF("cell", "vec")
    val assigned = Similarity.assignToCentroids(vecs, $"vec_id", $"embedding",
      centroids, $"cell", $"vec")
    val avgs = Similarity.recomputeCentroids(assigned)
    val newCents = Similarity.centroidsAsVectors(avgs)
    // cell 10 got vecs 1 and 2 (vec 4's cosine to cell 20 is 0 > -1)
    // -> mean = ((1+0.9)/2, (0+0.1)/2, 0)
    val c10 = newCents.filter($"cell" === 10L)
      .select("centroid").as[Seq[Double]].head()
    assert(math.abs(c10(0) - 0.95) < 1e-7 && math.abs(c10(1) - 0.05) < 1e-7)
    // rebuilt centroids feed the next assignment round unchanged in shape
    val assigned2 = Similarity.assignToCentroids(vecs, $"vec_id", $"embedding",
      newCents, $"cell", $"centroid")
    assert(assigned2.count() === vecs.count())
  }

  test("tfidf ranks a document's rare terms above corpus-wide ones") {
    val corpus = Seq(
      (1L, "shared shared unique_one"),
      (2L, "shared shared unique_two"),
      (3L, "shared shared unique_three")).toDF("doc_id", "text")
    val scores = TextAnalysis.tfidf(corpus, $"doc_id", $"text")
      .filter($"doc_id" === 1L)
      .select("token", "score").as[(String, Double)].collect().toMap
    // unique_one: tf 1/3, idf 3/1 -> 1.0; shared: tf 2/3, idf 3/3 -> 2/3
    assert(math.abs(scores("unique_one") - 1.0) < 1e-12)
    assert(math.abs(scores("shared") - 2.0 / 3) < 1e-12)
  }

  test("connectedComponents throws on non-convergence instead of returning wrong labels") {
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      graft.ops.Dedup.connectedComponents(chain, maxIter = 2).collect()
    }
    // converges fine with enough rounds
    val comp = graft.ops.Dedup.connectedComponents(chain, maxIter = 15)
      .as[(Long, Long)].collect().toMap
    assert(comp.values.toSet === Set(1L))
  }

  test("packByTokenBudget assigns offset-based bins with boundary spans flagged") {
    val rows = Seq(
      (1L, "a", 100L), (2L, "a", 900L), (3L, "a", 600L), (4L, "a", 500L),
      (5L, "b", 2500L)) // longer than the whole budget: spans by itself
      .toDF("id", "stream", "nt")
    val packed = graft.ops.Packing.packByTokenBudget(
      rows, $"stream", $"id", $"nt", budget = 1000L)
      .select("id", "cum_tokens", "bin_id", "spans_bins")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(packed(1L) === ((100L, 0L, false)))
    assert(packed(2L) === ((1000L, 0L, false))) // ends exactly on boundary
    assert(packed(3L) === ((1600L, 1L, false)))
    assert(packed(4L) === ((2100L, 1L, true))) // crosses the 2000 boundary
    assert(packed(5L) === ((2500L, 0L, true)))
  }

  test("contaminationFlags flags shingle overlap above threshold with argmax bench") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // 3 shared trigrams w/ 100
      (2L, "one two three four five six"), // zero overlap
      (3L, "alpha beta gamma nine ten eleven")) // 1 trigram each w/ 100, 101
      .toDF("id", "txt")
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon omega"),
      (101L, "seven eight nine ten eleven twelve"))
      .toDF("id", "txt")
    val flagged = graft.ops.Dedup.contaminationFlags(
      corpus, $"id", $"txt", bench, $"id", $"txt", n = 3, minShared = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(flagged === Set((1L, 100L, 3L)))
    // threshold 1 also surfaces doc 3, argmax tie broken by lowest bench id
    val loose = graft.ops.Dedup.contaminationFlags(
      corpus, $"id", $"txt", bench, $"id", $"txt", n = 3, minShared = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(loose === Set((1L, 100L, 3L), (3L, 100L, 1L)))
  }

  test("auto Jaccard picks per-block formulation and matches the dense result") {
    // one 30-doc hot block (routes to the inverted index) + small blocks
    val docs = ((1 to 30).map(i => (i.toLong, "hot",
      s"alpha beta gamma delta token$i epsilon zeta")) ++
      (31 to 36).map(i => (i.toLong, s"cold${i % 3}",
        s"one two three four token$i five six")))
      .toDF("id", "blk", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
        .collect().map(t => (t._1, t._2) -> t._3).toMap
    val dense = canon(graft.ops.Dedup.ngramJaccardPairs(
      docs, $"id", $"text", Seq($"blk"), n = 2, hashedShingles = true)
      .filter($"jaccard" > 0))
    val auto = canon(graft.ops.Dedup.ngramJaccardPairsAuto(
      docs, $"id", $"text", Seq($"blk"), n = 2, denseMaxBlock = 10))
    assert(auto.keySet === dense.keySet)
    auto.foreach { case (k, j) => assert(math.abs(j - dense(k)) < 1e-12, k) }
    // the switch fired: the hot block routed to the inverted-index path
    val (small, large) = graft.ops.Dedup.routeBlocksBySize(
      docs, $"id", $"text", Seq($"blk"), denseMaxBlock = 10)
    assert(large.count() === 30 && small.count() === 6)
  }

  test("connectedComponents converges in O(log n) rounds on a long path") {
    // a 200-node path has diameter 199: pure min-label propagation would
    // need 199 rounds; the pointer-jumping step must get there in < 20
    val path = (1L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) =
      graft.ops.Dedup.connectedComponentsWithRounds(path, maxIter = 20)
    val comp = labels.as[(Long, Long)].collect().toMap
    assert(comp.size === 200)
    assert(comp.values.toSet === Set(1L))
    assert(rounds < 20,
      s"200-node path should converge in < 20 rounds, took $rounds")
  }

  test("connectedComponents labels chains, triangles, and isolated pairs") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21} (pair)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("id_a", "id_b")
    val comp = graft.ops.Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L))
    assert(Seq(20L, 21L).forall(comp(_) == 20L))
  }

  test("detectLanguage picks the language with most marker hits") {
    val df = Seq(
      "the cat sat on a mat of the house",
      "el gato que vive en la casa de madrid",
      "le chat et un chien de paris",
      "der hund und die katze in das haus").toDF("text")
    val out = df.select(TextAnalysis.detectLanguage($"text")).as[String].collect()
    assert(out.toSeq === Seq("en", "es", "fr", "de"))
  }

  test("fingerprint is token-order-insensitive") {
    val df = Seq("alpha beta gamma", "gamma alpha beta", "alpha beta delta")
      .toDF("text")
    val fp = df.select(TextAnalysis.fingerprint($"text")).as[String].collect()
    assert(fp(0) === fp(1))
    assert(fp(0) !== fp(2))
  }

  test("quality score penalizes short/repetitive docs") {
    val df = Seq(
      ("good", "a meaningful sentence with many distinct informative words present here today"),
      ("bad", "x x x x")).toDF("id", "text")
    val scores = df.select($"id", TextAnalysis.qualityScore($"text"))
      .as[(String, Double)].collect().toMap
    assert(scores("good") > scores("bad"))
  }

  test("simpsonDiversity: exact hand-computed values, frequency-weighted") {
    val df = Seq(
      (1L, "a a a a"),        // 1 - 16/16 = 0
      (2L, "a b c d"),        // 1 - 4/16  = 0.75
      (3L, "a a b b"),        // 1 - 8/16  = 0.5
      (4L, "a a a a a a b c") // 36+1+1 over 64: 1 - 38/64
    ).toDF("doc_id", "text")
    val got = TextAnalysis.simpsonDiversity(df, $"doc_id", $"text")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(got(1L) === ((4L, 0.0)))
    assert(got(2L) === ((4L, 0.75)))
    assert(got(3L) === ((4L, 0.5)))
    assert(got(4L) === ((8L, 1.0 - 38.0 / 64.0)))
    // frequency-weighting: doc 4 has MORE distinct tokens than doc 3 but a
    // dominant token, and distinct-ratio alone would rank it higher
    assert(got(4L)._2 < got(2L)._2)
  }

  test("winsorize clamps to exact order statistics; tiny strata degrade sanely") {
    val df = ((1 to 100).map(i => ("big", i.toLong, i.toDouble)) ++
      Seq(("one", 900L, 42.0), ("two", 901L, 1.0), ("two", 902L, 99.0)))
      .toDF("s", "id", "v")
    val out = graft.ops.Profile.winsorize(df, $"s", $"v", $"id")
      .select($"id", $"clamped").as[(Long, Double)].collect().toMap
    assert(out(1L) === 5.0 && out(4L) === 5.0) // below p05 -> 5th smallest
    assert(out(100L) === 95.0 && out(96L) === 95.0) // above p95 -> 95th
    assert(out(50L) === 50.0) // interior untouched
    assert(out(900L) === 42.0) // single-row stratum: lo = hi = the value
    assert(out(901L) === 1.0 && out(902L) === 99.0) // n=2: band spans both
  }

  test("Funnel.funnel at 3 stages reproduces the hand-built q95 funnel") {
    val dir = "/root/testdata/sf0.001"
    val general = graft.ops.Funnel.funnel(
      Tables.load(spark, dir, "events"), col("user_id"), col("ts"),
      col("event_type"), Seq("view", "click", "purchase"))
      .select(col("user_id"), col("t_view").as("tv"),
        col("t_click").as("tc"), col("t_purchase").as("tp"))
      .orderBy("user_id").collect().toSeq
    val handBuilt = SparkEntry.queries("q95_funnel")(spark, dir)
      .select(col("user_id"), col("t_view").as("tv"),
        col("t_click").as("tc"), col("t_purchase").as("tp"))
      .orderBy("user_id").collect().toSeq
    assert(general === handBuilt)
  }

  test("pageRank: hub of a star dominates, mass conserved, 0 iters uniform") {
    val edges = (1L to 10L).flatMap(i =>
      Seq((s"leaf$i", "hub"), ("hub", s"leaf$i"))).toDF("src", "dst")
    val r = graft.ops.Graph.pageRank(edges, $"src", $"dst", iters = 3)
      .as[(String, Double)].collect().toMap
    assert(r("hub") > r("leaf1") * 3, s"hub not dominant: $r")
    // every node here has out-edges, so no mass leaks: Σ rank = 1 exactly
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    val r0 = graft.ops.Graph.pageRank(edges, $"src", $"dst", iters = 0)
      .as[(String, Double)].collect().toMap
    assert(r0.values.forall(v => math.abs(v - 1.0 / 11) < 1e-12))
  }

  test("pageRank redistributes dangling mass: rank sums to 1 every round") {
    // leaves point at the hub; the hub dangles (no out-edges at all)
    val edges = (1L to 10L).map(i => (s"leaf$i", "hub")).toDF("src", "dst")
    val leaky = graft.ops.Graph.pageRank(edges, $"src", $"dst", iters = 3)
      .as[(String, Double)].collect().toMap
    assert(leaky.values.sum < 0.9,
      s"without redistribution the hub's mass must leak: ${leaky.values.sum}")
    val kept = graft.ops.Graph.pageRank(edges, $"src", $"dst", iters = 3,
      redistributeDangling = true).as[(String, Double)].collect().toMap
    assert(math.abs(kept.values.sum - 1.0) < 1e-9,
      s"redistribution must conserve total mass: ${kept.values.sum}")
    assert(kept("hub") > kept("leaf1"),
      "the hub still dominates - redistribution is uniform, not a reset")
  }

  test("pageRank tol stop: converged ranks are a fixed point, iters is a cap") {
    val edges = (1L to 10L).flatMap(i =>
      Seq((s"leaf$i", "hub"), ("hub", s"leaf$i"))).toDF("src", "dst")
    // a loose tol stops after the very first round: result must equal the
    // fixed 1-iteration unroll exactly (pins that tol drives the loop)
    val early = graft.ops.Graph.pageRank(edges, $"src", $"dst",
      iters = 100, tol = 0.8).as[(String, Double)].collect().toMap
    val one = graft.ops.Graph.pageRank(edges, $"src", $"dst",
      iters = 1).as[(String, Double)].collect().toMap
    assert(early === one, "tol=0.8 must stop after round 1")
    // damping 0.5 mixes fast: the tol-stopped run (cap never reached) must
    // sit at the same fixed point as a longer fixed-count reference
    val converged = graft.ops.Graph.pageRank(edges, $"src", $"dst",
      iters = 80, damping = 0.5, tol = 1e-12)
      .as[(String, Double)].collect().toMap
    val ref = graft.ops.Graph.pageRank(edges, $"src", $"dst",
      iters = 60, damping = 0.5).as[(String, Double)].collect().toMap
    converged.foreach { case (node, r) =>
      assert(math.abs(r - ref(node)) < 1e-9,
        s"$node: tol-stopped rank $r != fixed-point rank ${ref(node)}")
    }
  }

  test("multimodal decode derives deterministic dimensions from payload bytes") {
    val assets = Multimodal.fromText(
      docs.withColumn("source", lit("s")), "doc_id", "text", "source")
    assert(assets.schema.fieldNames.toSeq ===
      Seq("asset_id", "modality", "payload", "meta"))
    val decoded = Multimodal.decode(assets)
    val rows = decoded.collect().map(r =>
      r.getAs[Long]("asset_id") -> (r.getAs[Int]("width"), r.getAs[Int]("height")))
      .toMap
    assert(rows(1L) === rows(4L)) // identical payload -> identical decode
    assert(rows.values.forall { case (w, h) => w >= 64 && h >= 64 })
    val stats = Multimodal.imageStats(decoded)
    assert(stats.columns.contains("aspect") && stats.columns.contains("pixels"))
  }

  test("repartitionByBytes sizes partitions to a byte budget") {
    val assets = Multimodal.fromText(
      docs.withColumn("source", lit("s")), "doc_id", "text", "source")
    val spreadOut = Multimodal.repartitionByBytes(assets, targetBytesPerPartition = 64)
    assert(spreadOut.rdd.getNumPartitions > 1) // ~300 bytes of payload / 64
    assert(spreadOut.count() === 5)
  }

  test("sampleFrames emits a strided frame index per video asset") {
    val assets = Multimodal.fromText(
      docs.withColumn("source", lit("s")), "doc_id", "text", "source",
      modality = "video")
    val decoded = Multimodal.decode(assets)
    val frames = Multimodal.sampleFrames(decoded, stride = 10, maxFrames = 8)
    assert(frames.count() > 0)
    assert(frames.select("frame_idx").as[Long].collect().forall(_ % 10 == 0))
  }

  test("personalizedPageRank: mass 1 every round, concentrates at the seeds") {
    import graft.ops.Graph
    // star: hub 0 -> 1..5, plus a chain 6 -> 7 (7 dangling)
    val edges = (Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L)) ++
      Seq((6L, 7L))).toDF("a", "b")
    val seeds = Seq(1L).toDF("node")
    for (iters <- 0 to 3) {
      val r = Graph.personalizedPageRank(edges, $"a", $"b", seeds, $"node",
        iters).collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
      // RWR conserves mass exactly: teleport + walk + dangling restart
      assert(math.abs(r.values.sum - 1.0) < 1e-12, s"mass leak at $iters")
      // the seed always holds the teleport floor
      assert(r(1L) >= (1.0 - 0.85), s"seed below teleport floor at $iters")
    }
    val r2 = Graph.personalizedPageRank(edges, $"a", $"b", seeds, $"node",
      iters = 3).collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // nodes unreachable from the seed (and not seeds) decay toward zero;
    // the seed (a sink here: its mass restarts at itself) dominates
    assert(r2(1L) > r2(0L) && r2(1L) > r2(7L))
    // a seed OUTSIDE the edge set is a legal teleport target
    val iso = Graph.personalizedPageRank(edges, $"a", $"b",
      Seq(99L).toDF("node"), $"node", iters = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(iso.contains(99L) && math.abs(iso.values.sum - 1.0) < 1e-12)
  }

  test("bm25Terms: saturation bounded by (k1+1)*idf, longer docs score lower") {
    val corpus = Seq(
      (1L, "data data data data data data data data data data pad pad"),
      (2L, "data pad pad pad pad pad pad pad pad pad pad pad"),
      (3L, "data pad pad pad pad pad pad pad pad pad pad pad " +
        "pad pad pad pad pad pad pad pad pad pad pad pad"),
      (4L, "other words only here none relevant at all in this document x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25Terms(corpus, $"doc_id", $"text", Seq("data"),
      k1 = 1.2, b = 0.75)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("tf"), r.getAs[Double]("bm25"))).toMap
    assert(out.keySet === Set(1L, 2L, 3L)) // doc 4 never matches
    // idf for df=3 of N=4: (4-3+0.5)/(3+0.5)+1; sat < k1+1 always
    val idf = (4.0 - 3.0 + 0.5) / (3.0 + 0.5) + 1.0
    out.values.foreach { case (_, s) => assert(s > 0 && s < (1.2 + 1.0) * idf) }
    assert(out(1L)._2 > out(2L)._2) // tf 10 beats tf 1 at same length
    assert(out(2L)._2 > out(3L)._2) // same tf, longer doc scores lower
  }

  test("gopherFlags: clean doc keeps; short, symbol-heavy, stopword-free drop") {
    val corpus = Seq(
      (1L, "the cat and the dog have played with all of that string " +
        "until both of them were done for the day and went to sleep " +
        "happily under the big warm roof of the house they guard"),
      (2L, "too short to pass"),
      (3L, "the cat and the dog have played with all of that string " +
        "until both ### of ### them ### were ### done ### for ### the " +
        "### day ### and ### went ### to ### sleep ### happily there"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherFlags(corpus, $"doc_id", $"text",
      minWords = 20, maxWords = 100)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("words_ok") &&
      !out(2L).getAs[Boolean]("keep"))
    assert(!out(3L).getAs[Boolean]("symbol_ok") &&
      !out(3L).getAs[Boolean]("keep"))
    // ratios are exact integer divisions: spot-check doc 2 (4 words)
    assert(out(2L).getAs[Long]("n_words") === 4L)
    assert(out(2L).getAs[Double]("mean_word_len") === 14.0 / 4.0)
  }

  test("containmentPairs: embedded doc hits 1.0 where Jaccard dilutes") {
    val host = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // fully inside 2
      (2L, host),
      (3L, "unrelated totally different words entirely elsewhere again"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(corpus, $"doc_id", $"text",
      n = 3, minContain = 0.5, maxDf = 100)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("containment")).toMap
    assert(out((1L, 2L)) === 1.0) // every trigram of 1 appears in 2
    assert(!out.contains((2L, 1L)) || out((2L, 1L)) < 1.0) // not symmetric
    assert(!out.keys.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("containmentPairs maxDf cap drops boilerplate shingles from evidence") {
    // "x y z" appears in every doc -> df 3; with maxDf = 2 it cannot pair
    val corpus = Seq(
      (1L, "x y z a b c"), (2L, "x y z d e f"), (3L, "x y z g h i"))
      .toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(corpus, $"doc_id", $"text",
      n = 3, minContain = 0.1, maxDf = 2)
    assert(capped.count() === 0)
    val uncapped = Dedup.containmentPairs(corpus, $"doc_id", $"text",
      n = 3, minContain = 0.1, maxDf = 3)
    assert(uncapped.count() === 6) // all ordered pairs share the hot trigram
  }

  test("contaminationFlagsBloom is row-identical to the exact posting join") {
    val corpus = docs
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog today"),
      (101L, "spark query engines at scale differ completely"))
      .toDF("doc_id", "text")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("bench_id"), r.getAs[Long]("n_shared"))).toSet
    val exact = key(Dedup.contaminationFlags(
      corpus, $"doc_id", $"text", bench, $"doc_id", $"text",
      n = 3, minShared = 2))
    val bloomed = key(Dedup.contaminationFlagsBloom(
      corpus, $"doc_id", $"text", bench, $"doc_id", $"text",
      n = 3, minShared = 2, expectedBenchShingles = 1000L, fpp = 0.01))
    assert(exact.nonEmpty) // the law must bite on something
    assert(bloomed === exact)
  }

  test("histogramDrift: identical populations score exactly 0, disjoint score 2") {
    import graft.ops.Profile
    val same = (1 to 100).flatMap(i =>
      Seq(("g", i.toDouble, false), ("g", i.toDouble, true)))
      .toDF("g", "v", "cur")
    val zero = Profile.histogramDrift(same, $"g", $"v", $"cur",
        binWidth = 10.0, nBins = 12)
      .select("drift").as[Double].collect()
    assert(zero === Array(0.0), "identical histograms must score exactly 0")
    // reference all in bin 0, current all in the top bin: no overlap
    val disj = ((1 to 50).map(_ => ("g", 1.0, false)) ++
      (1 to 50).map(_ => ("g", 1000.0, true))).toDF("g", "v", "cur")
    val two = Profile.histogramDrift(disj, $"g", $"v", $"cur",
        binWidth = 10.0, nBins = 12)
      .select("drift").as[Double].collect()
    assert(two === Array(2.0), "disjoint histograms must score exactly 2")
  }

  test("histogramDrift: groups missing a side are omitted; nulls excluded") {
    import graft.ops.Profile
    val rows: Seq[(String, Option[Double], Boolean)] =
      Seq(("both", Some(1.0), false), ("both", Some(2.0), true),
        ("refonly", Some(1.0), false), ("curonly", Some(1.0), true),
        ("both", None, true))
    val out = Profile.histogramDrift(rows.toDF("g", "v", "cur"),
        $"g", $"v", $"cur", binWidth = 1.0, nBins = 4)
      .select("group_key", "n_ref", "n_cur")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet === Set("both"))
    assert(out("both") === ((1L, 1L)), "null value row must not count")
  }
}
