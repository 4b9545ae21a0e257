package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Bpe, Eval, Multimodal, Sampling, Sketch, TextAnalysis}

/** Hand-checked laws for the round-7c operators: KMV set algebra
  * (exactness below k, calibration, symmetry), the perceptual dHash
  * family (known-grid bits, brightness invariance, pigeonhole recovery,
  * the REAL ImageIO grid codec on synthetic PNGs), and the one-pass
  * Poisson-bootstrap AUC (the materialized-resample equality law).
  */
class Round7cOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ——— KMV set algebra ————————————————————————————————————————————————

  test("kmvOverlap: below-k sketches are EXACT (jaccard == true jaccard)") {
    // |A|=60, |B|=60, |A∩B|=20, |A∪B|=100 < k=256 → everything exact
    val a = (0 until 60).map(i => s"v$i").toDF("v")
    val b = (40 until 100).map(i => s"v$i").toDF("v")
    val r = Sketch.kmvOverlap(a, $"v", b, $"v", k = 256)
      .select("n_union_min", "n_both", "jaccard_est", "est_union",
        "est_intersection")
      .head()
    assert(r.getLong(0) === 100L)
    assert(r.getLong(1) === 20L)
    assert(r.getDouble(2) === 0.2d)
    assert(r.getDouble(3) === 100.0d)
    assert(r.getDouble(4) === 20.0d)
  }

  test("kmvOverlap: disjoint corpora estimate jaccard 0; identical 1") {
    val a = (0 until 50).map(i => s"a$i").toDF("v")
    val b = (0 until 50).map(i => s"b$i").toDF("v")
    assert(Sketch.kmvOverlap(a, $"v", b, $"v", k = 64)
      .head().getAs[Double]("jaccard_est") === 0.0d)
    assert(Sketch.kmvOverlap(a, $"v", a, $"v", k = 64)
      .head().getAs[Double]("jaccard_est") === 1.0d)
  }

  test("kmvOverlap: symmetric in its arguments") {
    val a = (0 until 300).map(i => s"v$i").toDF("v")
    val b = (100 until 400).map(i => s"v$i").toDF("v")
    val ab = Sketch.kmvOverlap(a, $"v", b, $"v", k = 128).collect()
    val ba = Sketch.kmvOverlap(b, $"v", a, $"v", k = 128).collect()
    assert(ab === ba)
  }

  test("kmvOverlap: k-bounded estimate lands near the true jaccard") {
    // true J = 1000/3000 = 0.333…; k = 256 → ±1/√k ≈ 0.0625 band
    val a = (0 until 2000).map(i => s"v$i").toDF("v")
    val b = (1000 until 3000).map(i => s"v$i").toDF("v")
    val j = Sketch.kmvOverlap(a, $"v", b, $"v", k = 256)
      .head().getAs[Double]("jaccard_est")
    assert(math.abs(j - 1.0 / 3.0) < 0.1, s"jaccard_est $j far from 1/3")
  }

  // ——— perceptual dHash ———————————————————————————————————————————————

  test("dhash: a hand-built gradient grid yields the expected bits") {
    // strictly increasing rows → every left<right comparison fails → 0;
    // strictly decreasing rows → every comparison true → band 255
    val inc = (0 until 72).toArray
    val dec = inc.map(i => 72 - i)
    val df = Seq((1L, inc.toSeq), (2L, dec.toSeq)).toDF("asset_id", "grid")
    val got = Multimodal.withDhash(df)
      .select($"asset_id", $"dhash").as[(Long, String)].collect().toMap
    assert(got(1L) === "00" * 8)
    assert(got(2L) === "ff" * 8)
  }

  test("dhash: invariant to global brightness shift, sensitive to order flips") {
    val g = Array(9, 3, 7, 1, 8, 2, 6, 4, 5)
    val base = (0 until 72).map(i => g(i % 9) * 10).toSeq
    val brighter = base.map(_ + 50) // same ORDER everywhere
    val df = Seq((1L, base), (2L, brighter)).toDF("asset_id", "grid")
    val h = Multimodal.withDhash(df)
      .select($"asset_id", $"dhash").as[(Long, String)].collect().toMap
    assert(h(1L) === h(2L))
  }

  test("dhash: undecodable (empty) grids yield null bands/dhash") {
    val df = Seq((1L, Seq.empty[Int]), (2L, (0 until 72).toSeq))
      .toDF("asset_id", "grid")
    val h = Multimodal.withDhash(df)
    assert(h.filter($"asset_id" === 1L && $"dhash".isNull).count() === 1L)
    assert(h.filter($"asset_id" === 2L && $"dhash".isNotNull).count() === 1L)
  }

  test("hammingNearDupPairs: recovers planted pair, rejects far pairs") {
    // bands: id 1 and 2 differ in ONE band by one bit (hamming 1);
    // id 3 differs everywhere (hamming 32)
    val b1 = Seq(10, 20, 30, 40)
    val b2 = Seq(10, 21, 30, 40) // 20^21 = 1 bit
    val b3 = Seq(255, 255, 255, 255)
    val df = Seq((1L, b1), (2L, b2), (3L, b3)).toDF("id", "bands")
    val pairs = Multimodal.hammingNearDupPairs(df, $"id", $"bands", maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs === Set((1L, 2L, 1)))
  }

  test("hammingNearDupPairs: pigeonhole needs one agreeing band (contract)") {
    // hamming 2 but spread over ALL bands of a 2-band split → no equal
    // band → the pigeonhole join cannot see it (needs bands > maxDist)
    val df = Seq((1L, Seq(1, 1)), (2L, Seq(0, 0))).toDF("id", "bands")
    assert(Multimodal.hammingNearDupPairs(df, $"id", $"bands", maxDist = 2)
      .count() === 0L)
    // with 3+ bands for maxDist 2 the guarantee holds
    val df3 = Seq((1L, Seq(1, 1, 7)), (2L, Seq(0, 0, 7))).toDF("id", "bands")
    assert(Multimodal.hammingNearDupPairs(df3, $"id", $"bands", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet === Set((1L, 2L, 2)))
  }

  // ——— audio fingerprint ——————————————————————————————————————————————

  test("audioSignBands: gain shifts flip nothing; a bump flips only local bits") {
    val s0 = Seq(100, -50, 300, 20, -200, 150, 80, -10)
    val gained = s0.map(_ * 2) // same ORDER everywhere
    val bumped = s0.updated(4, 25) // -200 -> 25: crosses s3=20, flips locally
    val frames = Seq((1L, 0, s0), (2L, 0, gained), (3L, 0, bumped))
      .toDF("asset_id", "frame_idx", "samples")
    val b = Multimodal.audioSignBands(frames)
      .select($"asset_id", $"bands").as[(Long, Seq[Int])].collect().toMap
    assert(b(1L) === b(2L), "gain shift changed the fingerprint")
    val d = Integer.bitCount(b(1L).head ^ b(3L).head)
    assert(d >= 1 && d <= 8, s"one-sample bump flipped $d bits")
  }

  test("audioSignBands: bands come out in frame order") {
    // frame 1 strictly increasing (all comparison bits set),
    // frame 0 strictly decreasing (none) — delivered out of order
    val inc = (1 to 8).map(_ * 10)
    val dec = inc.reverse
    val frames = Seq((1L, 1, inc), (1L, 0, dec))
      .toDF("asset_id", "frame_idx", "samples")
    val b = Multimodal.audioSignBands(frames)
      .select($"bands").as[Seq[Int]].head()
    assert(b === Seq(0, (1 << 22) - 1))
  }

  // ——— real ImageIO grid codec ————————————————————————————————————————

  private def pngBytes(w: Int, h: Int,
                       px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoGridCodec: near-identical PNGs land close; unrelated far") {
    // deterministic pseudo-random texture; the variant edits ONE cell
    // block; the unrelated image is the inverse texture
    def tex(x: Int, y: Int): Int = {
      val v = (x * 31 + y * 17) % 256
      (v << 16) | (v << 8) | v
    }
    val base = pngBytes(90, 80, tex)
    val variant = pngBytes(90, 80, (x, y) =>
      if (x < 10 && y < 10) 0xffffff else tex(x, y))
    val other = pngBytes(90, 80, (x, y) => {
      val v = 255 - (x * 31 + y * 17) % 256
      (v << 16) | (v << 8) | v
    })
    val assets = Seq((1L, base), (2L, variant), (3L, other))
      .toDF("asset_id", "payload")
    val bands = Multimodal.withDhash(
        Multimodal.decodeGrid(assets, Multimodal.ImageIoGridCodec))
      .select($"asset_id", $"bands").as[(Long, Seq[Int])].collect().toMap
    def ham(a: Seq[Int], b: Seq[Int]): Int =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val near = ham(bands(1L), bands(2L))
    val far = ham(bands(1L), bands(3L))
    assert(near <= 6, s"edited image drifted $near bits")
    assert(far >= 16, s"unrelated image only $far bits away")
    assert(near < far)
  }

  test("ImageIoGridCodec: corrupt payloads yield empty grids, not throws") {
    val assets = Seq((1L, Array[Byte](1, 2, 3)),
        (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("asset_id", "payload")
    val n = Multimodal.decodeGrid(assets, Multimodal.ImageIoGridCodec)
      .filter(size($"grid") === 0).count()
    assert(n === 2L)
  }

  // ——— one-pass bootstrap AUC —————————————————————————————————————————

  test("bootstrapAuc: each replicate equals binaryAuc on the materialized resample") {
    val df = (0 until 200).map { i =>
      (i.toLong, i % 23, i % 3 == 0)
    }.toDF("id", "s", "p")
    val perRep = Eval.bootstrapAuc(df, $"id", $"s", $"p",
      reps = 4, maxCopies = 8)
    // materialize replicate r's multiset with the SAME salted draw
    val bounds = Sampling.poissonBounds(8)
    for (r <- 0 until 4) {
      // enc("boot" + r) = "v5:bootR" for single-digit r — the spec
      // rebuilds Sampling's injective encoding from the outside
      val h = expr("conv(substring(md5(concat(" +
        s"'v5:boot$r', '|', " +
        "'v' || length(cast(id as string)) || ':' || cast(id as string)" +
        ")), 1, 8), 16, 10)").cast("long")
      val copies = bounds.map(t => when(h >= t, 1L).otherwise(0L))
        .reduce(_ + _)
      val resample = df.withColumn("__c", copies)
        .filter($"__c" > 0L)
        .withColumn("__i", explode(sequence(lit(0L), $"__c" - 1L)))
      val direct = Eval.binaryAuc(resample, $"s", $"p")
        .select($"n_pos", $"n_neg", $"auc").head()
      val fused = perRep.filter($"rep" === r)
        .select($"n_pos", $"n_neg", $"auc").head()
      assert(fused === direct, s"replicate $r diverged")
    }
  }

  test("bootstrapAuc: a perfect separator scores auc 1.0 in every replicate") {
    val df = (0 until 100).map(i => (i.toLong, i, i >= 50)).toDF("id", "s", "p")
    val aucs = Eval.bootstrapAuc(df, $"id", $"s", $"p", reps = 8)
      .select($"auc").as[Double].collect()
    assert(aucs.length === 8 && aucs.forall(_ === 1.0d))
  }

  // ——— per-group KMV ——————————————————————————————————————————————————

  test("kmvDistinctBy: below-k groups report the exact distinct count") {
    val df = Seq(("a", 1), ("a", 2), ("a", 2), ("b", 9), ("b", 8),
      ("b", 7), ("b", 7)).toDF("g", "v")
    val got = Sketch.kmvDistinctBy(df, $"g", $"v", k = 64)
      .select($"group", $"est_distinct").as[(String, Double)]
      .collect().toMap
    assert(got === Map("a" -> 2.0d, "b" -> 3.0d))
  }

  test("kmvDistinctBy: a group's estimate ignores other groups' rows") {
    val a = Seq.tabulate(500)(i => ("a", s"v$i")).toDF("g", "v")
    val ab = a.unionAll(Seq.tabulate(900)(i => ("b", s"w$i")).toDF("g", "v"))
    val solo = Sketch.kmvDistinctBy(a, $"g", $"v", k = 32).collect()
    val mixed = Sketch.kmvDistinctBy(ab, $"g", $"v", k = 32)
      .filter($"group" === "a").collect()
    assert(solo === mixed)
  }

  // ——— CMS join-size / incremental Hamming ————————————————————————————

  test("cmsJoinSize: collision-free sketch gives the exact join size") {
    // A: a x3, b x2; B: a x4, c x5 → |A join B| = 3*4 = 12
    val a = Seq("a", "a", "a", "b", "b").toDF("k")
    val b = Seq("a", "a", "a", "a", "c", "c", "c", "c", "c").toDF("k")
    val est = Sketch.cmsJoinSize(a, $"k", b, $"k",
      depth = 4, width = 1 << 16).head().getLong(0)
    assert(est === 12L)
  }

  test("cmsJoinSize: one-sided — narrow sketch only ever overcounts") {
    val a = Seq.tabulate(400)(i => s"k${i % 29}").toDF("k")
    val exact = a.groupBy("k").count()
      .agg(sum($"count" * $"count")).head().getLong(0)
    val est = Sketch.cmsJoinSize(a, $"k", a, $"k",
      depth = 4, width = 8).head().getLong(0)
    assert(est >= exact, s"CMS inner product undercounted: $est < $exact")
  }

  test("hamming across: batch split law — within(all) == within each + across") {
    val rows = Seq(
      (1L, Seq(10, 20, 30, 40)), (2L, Seq(10, 21, 30, 40)),
      (3L, Seq(99, 98, 30, 40)), (4L, Seq(99, 98, 30, 41)),
      (5L, Seq(10, 20, 31, 40)))
    val all = rows.toDF("id", "bands")
    val (h1, h2) = (rows.take(2).toDF("id", "bands"),
      rows.drop(2).toDF("id", "bands"))
    val whole = Multimodal.hammingNearDupPairs(all, $"id", $"bands", 3)
      .as[(Long, Long, Int)].collect().toSet
    val pieced =
      Multimodal.hammingNearDupPairs(h1, $"id", $"bands", 3)
        .as[(Long, Long, Int)].collect().toSet ++
      Multimodal.hammingNearDupPairs(h2, $"id", $"bands", 3)
        .as[(Long, Long, Int)].collect().toSet ++
      Multimodal.hammingNearDupPairsAcross(h1, $"id", $"bands",
          h2, $"id", $"bands", 3)
        .as[(Long, Long, Int)].collect().toSet
    assert(whole === pieced && whole.nonEmpty)
  }

  // ——— BPE trainer / encoder ——————————————————————————————————————————

  test("bpe: learns the textbook merge sequence on a hand corpus") {
    // "low" x5, "lowest" x2, "newer" x6, "wider" x3  (Sennrich-style)
    val words = Seq(("low", 5L), ("lowest", 2L), ("newer", 6L),
      ("wider", 3L)).toDF("word", "cnt")
    val merges = Bpe.bpeMerges(words, $"word", $"cnt", iters = 3)
      .orderBy("ord")
      .as[(Int, String, String, String, Long)].collect().toList
    // pair counts round 1: (e,r)=9 (newer6+wider3) wins;
    // round 2: er as one token → (w,er)? newer has w-er? n-e-w-er: (w,er)=6,
    // (e,w)=6... tie → lexicographic: (e,w) < (w,er) wait counts: (e,w)
    // appears in newer(6) only = 6; (w,er) in newer 6; (d,er) in wider 3;
    // (l,o) in low+lowest = 7 → (l,o)=7 wins round 2; round 3: (lo,w)=7
    assert(merges(0) === ((0, "e", "r", "er", 9L)))
    assert(merges(1) === ((1, "l", "o", "lo", 7L)))
    assert(merges(2) === ((2, "lo", "w", "low", 7L)))
  }

  test("bpe: greedy merge consumes runs left-to-right (aaa -> aa, a)") {
    val words = Seq(("aaa", 10L)).toDF("word", "cnt")
    val m = Bpe.bpeMerges(words, $"word", $"cnt", iters = 1)
      .as[(Int, String, String, String, Long)].head()
    assert(m === ((0, "a", "a", "aa", 20L))) // both adjacent positions count
    val enc = Seq("aaa").toDF("w")
      .select(Bpe.encodeSpaced($"w", Seq("a" -> "a")).as("t"))
      .as[Seq[String]].head()
    assert(enc === Seq("aa", "a"))
  }

  test("bpe: trainer stops early when no pair repeats") {
    val words = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "cnt")
    val merges = Bpe.bpeMerges(words, $"word", $"cnt", iters = 8)
    assert(merges.count() === 0L)
  }

  test("bpe: encodeSpaced applies merges in learn order") {
    // th+e composes: "the" -> th, e -> the
    val enc = Seq("the", "then", "cat").toDF("w")
      .select($"w", Bpe.encodeSpaced($"w",
        Seq("t" -> "h", "th" -> "e")).as("t"))
      .as[(String, Seq[String])].collect().toMap
    assert(enc("the") === Seq("the"))
    assert(enc("then") === Seq("the", "n"))
    assert(enc("cat") === Seq("c", "a", "t"))
  }

  test("binaryAucBy: each group's AUC equals binaryAuc on that group alone") {
    val df = (0 until 300).map { i =>
      (s"g${i % 3}", i % 17, (i * 11) % 7 < 3)
    }.toDF("g", "s", "p")
    val grouped = Eval.binaryAucBy(df, $"g", $"s", $"p")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = Eval.binaryAuc(df.filter($"g" === g), $"s", $"p").head()
      assert(grouped(g) ===
        ((solo.getLong(0), solo.getLong(1), solo.getDouble(2))),
        s"group $g diverged from the solo run")
    }
  }

  // ——— Bradley–Terry ——————————————————————————————————————————————————

  test("bradleyTerry: the item that wins every duel gets the top score") {
    val pairs = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d")).toDF("w", "l") // total order a > b > c > d
    val s = graft.ops.Train.bradleyTerryScores(pairs, $"w", $"l",
        iters = 5, rate = 1.0)
      .select($"item", $"score").as[(String, Double)].collect().toMap
    assert(s("a") > s("b") && s("b") > s("c") && s("c") > s("d"),
      s"learned order wrong: $s")
  }

  test("bradleyTerry: zero iterations keep the zero init; tallies exact") {
    val pairs = Seq(("x", "y"), ("y", "x"), ("x", "y")).toDF("w", "l")
    val m = graft.ops.Train.bradleyTerryScores(pairs, $"w", $"l",
        iters = 0, rate = 1.0)
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(m("x") === ((0.0d, 2L, 1L)))
    assert(m("y") === ((0.0d, 1L, 2L)))
  }

  test("bradleyTerry: self-pairs and null sides are dropped") {
    val pairs = Seq(Some("a") -> Some("a"), Some("a") -> None,
      None -> Some("b"), Some("a") -> Some("b")).toDF("w", "l")
    val n = graft.ops.Train.bradleyTerryScores(pairs, $"w", $"l",
      iters = 1, rate = 1.0).count()
    assert(n === 2L) // only items a and b, from the one valid pair
  }

  // ——— Luhn / readability —————————————————————————————————————————————

  test("luhnCardScan: validates the classic test numbers, rejects off-by-one") {
    val docs = Seq(
      (1L, "visa 4532015112830366 ok"),       // valid
      (2L, "amex 371449635398431 ok"),        // valid (15 digits)
      (3L, "bad 4532015112830367 nope"),      // last digit bumped
      (4L, "short 1234 run and 123456789012 too short")) // 12 digits: out
      .toDF("id", "text")
    val got = TextAnalysis.luhnCardScan(docs, $"id", $"text")
      .select($"doc_id", $"run", $"luhn_ok")
      .as[(Long, String, Boolean)].collect().toSet
    assert(got === Set(
      (1L, "4532015112830366", true),
      (2L, "371449635398431", true),
      (3L, "4532015112830367", false)))
  }

  test("readability: a simple sentence scores higher than dense prose") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran."),
      (2L, "Notwithstanding institutional heterogeneity, organizational " +
        "exigencies necessitate comprehensive reorganization."))
      .toDF("id", "text")
    val f = TextAnalysis.readability(docs, $"id", $"text")
      .select($"doc_id", $"flesch").as[(Long, Double)].collect().toMap
    assert(f(1L) > 80.0, s"simple text scored ${f(1L)}")
    assert(f(2L) < 10.0, s"dense text scored ${f(2L)}")
  }

  test("readability: fragment without terminator counts one sentence") {
    val r = TextAnalysis.readability(
        Seq((1L, "just a fragment")).toDF("id", "text"), $"id", $"text")
      .head()
    assert(r.getAs[Int]("n_sentences") === 1)
    assert(r.getAs[Int]("n_words") === 3)
  }

  test("bootstrapAucSummary: folds to (n, mean, lo, hi) with lo <= mean <= hi") {
    val df = (0 until 300).map { i =>
      (i.toLong, i % 31, (i * 7) % 5 < 2)
    }.toDF("id", "s", "p")
    val s = Eval.bootstrapAucSummary(
      Eval.bootstrapAuc(df, $"id", $"s", $"p", reps = 16)).head()
    val (n, mean, lo, hi) = (s.getLong(0), s.getDouble(1),
      s.getDouble(2), s.getDouble(3))
    assert(n === 16L)
    assert(lo <= mean && mean <= hi)
    assert(lo < hi, "16 resamples of a noisy scorer must show spread")
  }
}
