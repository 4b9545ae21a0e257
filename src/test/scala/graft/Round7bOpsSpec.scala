package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Sampling, Similarity, Sketch, TextAnalysis, Train}

/** Hand-checked laws for the round-7b operators: the Count-Min sketch
  * (build, probe, merge, empty laws), the in-engine linear-probe
  * trainer (empty law, direction-of-learning, train/serve consistency),
  * SemDeDup keep-lists, DSIR importance weights, and the deterministic
  * payload reservoir.
  */
class Round7bOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ——— Count-Min sketch ———————————————————————————————————————————————

  test("cms: every hash row's cells sum to the corpus row count") {
    val df = Seq("a", "b", "c", "a", "b", "a", null).toDF("k")
    val perRow = Sketch.cmsState(df, $"k", depth = 4, width = 8)
      .groupBy("r").agg(sum("cnt").as("n"))
      .as[(Int, Long)].collect().toMap
    assert(perRow === Map(0 -> 7L, 1 -> 7L, 2 -> 7L, 3 -> 7L))
  }

  test("cms: point estimate is one-sided (est >= exact, always)") {
    val df = Seq.tabulate(500)(i => s"k${i % 37}").toDF("k")
    val state = Sketch.cmsState(df, $"k", depth = 4, width = 16)
    val keys = df.select($"k").distinct()
    val est = Sketch.cmsEstimate(keys, $"k", state, depth = 4, width = 16)
    val exact = df.groupBy($"k".as("key")).agg(count(lit(1)).as("ex"))
    val bad = est.join(exact, Seq("key"))
      .filter($"est_count" < $"ex").count()
    assert(bad === 0L)
    // and the estimate never exceeds the total row count
    assert(est.filter($"est_count" > 500L).count() === 0L)
  }

  test("cms: wide sketch with few keys is collision-free (est == exact)") {
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("k")
    val state = Sketch.cmsState(df, $"k", depth = 4, width = 1 << 16)
    val est = Sketch.cmsEstimate(df.select($"k").distinct(), $"k", state,
        depth = 4, width = 1 << 16)
      .as[(String, Long)].collect().toMap
    assert(est === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("cms: merge law — sketch(A ⊎ B) == merge(sketch(A), sketch(B))") {
    val a = Seq("x", "y", "x").toDF("k")
    val b = Seq("y", "z").toDF("k")
    val whole = Sketch.cmsState(a.unionAll(b), $"k", depth = 4, width = 8)
    val merged = Sketch.cmsMergeStates(
      Sketch.cmsState(a, $"k", depth = 4, width = 8),
      Sketch.cmsState(b, $"k", depth = 4, width = 8))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("cms: the empty corpus yields the empty (all-zero) sketch") {
    val empty = Seq.empty[String].toDF("k")
    assert(Sketch.cmsState(empty, $"k", depth = 4, width = 8).count() === 0L)
    val est = Sketch.cmsEstimate(Seq("a").toDF("k"), $"k",
        Sketch.cmsState(empty, $"k", depth = 4, width = 8),
        depth = 4, width = 8)
      .as[(String, Long)].head()
    assert(est === (("a", 0L)))
  }

  test("cms: null keys hash like a value (the enc null token)") {
    val df = Seq[Option[String]](None, None, Some("a")).toDF("k")
    val state = Sketch.cmsState(df, $"k", depth = 4, width = 8)
    // 3 rows counted in every hash row — nulls are not dropped
    val perRow = state.groupBy("r").agg(sum("cnt").as("n"))
      .as[(Int, Long)].collect().toMap
    assert(perRow.values.toSet === Set(3L))
  }

  // ——— linear-probe trainer ———————————————————————————————————————————

  private val feats = Seq("bias" -> lit(1.0d), "x" -> col("x"))

  test("probe: the empty corpus keeps the all-zero init (empty law)") {
    val empty = Seq.empty[(Double, Double)].toDF("y", "x")
    val w = Train.linearProbeWeights(empty, $"y", feats, iters = 3,
      rate = 0.1)
    assert(w === Seq("bias" -> 0.0, "x" -> 0.0))
  }

  test("probe: zero iterations returns the init; weights move TOWARD " +
      "the labels on separable data") {
    val df = Seq((1.0, 2.0), (1.0, 3.0), (0.0, -2.0), (0.0, -3.0))
      .toDF("y", "x")
    assert(Train.linearProbeWeights(df, $"y", feats, 0, 0.1)
      .forall(_._2 == 0.0))
    // y = 1 ⟺ x > 0: the slope must turn positive and keep growing
    val w1 = Train.linearProbeWeights(df, $"y", feats, 1, 0.1).toMap
    val w5 = Train.linearProbeWeights(df, $"y", feats, 5, 0.1).toMap
    assert(w1("x") > 0.0 && w5("x") > w1("x"))
  }

  test("probe: score/eval use the SAME sigma tree (perfect fit on " +
      "separable data once trained)") {
    val df = Seq((1.0, 2.0), (1.0, 3.0), (0.0, -2.0), (0.0, -3.0))
      .toDF("y", "x")
    val w = Train.linearProbeWeights(df, $"y", feats, iters = 10,
      rate = 0.5)
    val m = Train.linearProbeEval(df, $"y", feats, w)
      .as[(Long, Long, Double, Double)].head()
    assert(m._1 === 4L && m._2 === 4L && m._3 === 1.0)
    val scored = Train.linearProbeScore(df, feats, w)
    assert(scored.filter(($"score" >= 0.5).cast("int") =!= $"predicted")
      .count() === 0L)
  }

  test("probe: feature/weight name mismatch fails fast") {
    val df = Seq((1.0, 2.0)).toDF("y", "x")
    intercept[IllegalArgumentException] {
      Train.linearProbeScore(df, feats, Seq("bias" -> 0.0, "z" -> 0.0))
    }
  }

  // ——— semanticDedup —————————————————————————————————————————————————

  private def axis4(i: Int): Array[Float] = {
    val a = Array.fill(4)(0.0f); a(i) = 1.0f; a
  }

  test("semanticDedup: near-identical vectors group, the min id is kept") {
    // 1 and 2 are the same direction (cos = 1); 3 is orthogonal
    val pts = Seq((1L, axis4(0)), (2L, axis4(0)), (3L, axis4(1)))
      .toDF("id", "v")
    val cents = Seq((0L, axis4(0)), (1L, axis4(1))).toDF("cell", "cvec")
    val out = Similarity.semanticDedup(pts, $"id", $"v", cents, $"cell",
        $"cvec", minCosine = 0.9, nprobe = 2)
      .orderBy("id").as[(Long, Long, Int)].collect().toSeq
    assert(out === Seq((1L, 1L, 1), (2L, 1L, 0), (3L, 3L, 1)))
  }

  test("semanticDedup: below-threshold corpus keeps everything " +
      "(all singletons)") {
    val pts = Seq((1L, axis4(0)), (2L, axis4(1)), (3L, axis4(2)))
      .toDF("id", "v")
    val cents = Seq((0L, axis4(0))).toDF("cell", "cvec")
    val out = Similarity.semanticDedup(pts, $"id", $"v", cents, $"cell",
      $"cvec", minCosine = 0.5, nprobe = 1)
    assert(out.filter($"kept" === 1).count() === 3L)
  }

  // ——— importanceWeights ——————————————————————————————————————————————

  test("importance: docs made of target-only tokens outrank docs of " +
      "non-target tokens") {
    val docs = Seq(
      (1L, "alpha alpha beta", true), (2L, "alpha beta beta", true),
      (3L, "gamma delta gamma", false), (4L, "delta gamma delta", false),
      (5L, "alpha beta", false) // target-looking doc OUTSIDE the target
    ).toDF("doc_id", "text", "is_t")
    val out = TextAnalysis.importanceWeights(docs, $"doc_id", $"text",
        $"is_t")
      .orderBy($"importance".desc, $"doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    // the target-vocabulary docs (1, 2, 5) must all outrank the
    // out-of-domain docs (3, 4) — including doc 5, which is the point:
    // DSIR scores CONTENT, not membership
    val rank = out.map(_._1)
    assert(rank.take(3).toSet === Set(1L, 2L, 5L))
    // every ratio readout is positive and finite
    assert(out.forall(r => r._3 > 0.0 && !r._3.isInfinite))
  }

  test("importance: empty target sub-corpus still scores (smoothing " +
      "keeps ratios finite)") {
    val docs = Seq((1L, "a b", false), (2L, "c d", false))
      .toDF("doc_id", "text", "is_t")
    val out = TextAnalysis.importanceWeights(docs, $"doc_id", $"text",
      $"is_t")
    assert(out.count() === 2L &&
      out.filter($"importance".isNull).count() === 0L)
  }

  // ——— uniformTopKSample ——————————————————————————————————————————————

  test("sample: nesting — the k-sample is a prefix of the 2k-sample") {
    val df = spark.range(1000).toDF("id")
    val small = Sampling.uniformTopKSample(df, $"id", 16)
      .select("id").as[Long].collect().toSet
    val big = Sampling.uniformTopKSample(df, $"id", 32)
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(big) && small.size === 16 && big.size === 32)
  }

  test("sample: merge law — sample(A ⊎ B) == top-k(sample(A) ∪ sample(B))") {
    val a = spark.range(0, 500).toDF("id")
    val b = spark.range(500, 1000).toDF("id")
    val whole = Sampling.uniformTopKSample(a.unionAll(b), $"id", 24)
      .select("id").as[Long].collect().toSet
    val merged = Sampling.uniformTopKSample(
        Sampling.uniformTopKSample(a, $"id", 24)
          .unionAll(Sampling.uniformTopKSample(b, $"id", 24)),
        $"id", 24)
      .select("id").as[Long].collect().toSet
    assert(whole === merged)
  }
}
