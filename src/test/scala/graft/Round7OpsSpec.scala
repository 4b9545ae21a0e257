package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Similarity, Sketch, TextAnalysis}

/** Hand-checked laws for the round-7 operators: simplified silhouette,
  * the KMV distinct sketch, and content-defined chunking.
  */
class Round7OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def axis(i: Int, scale: Float = 1.0f): Array[Float] = {
    val a = Array.fill(4)(0.0f); a(i) = scale; a
  }

  // ——— silhouetteSimplified ———————————————————————————————————————————

  test("silhouette: perfect assignment scores 1, a misfit goes negative") {
    // centroids on axes 0 and 1. p1/p2 sit exactly on their assigned
    // axes (a = 0, b = 1 → s = 1); p3 is ON axis 0 but ASSIGNED to cell
    // 1 (a = 1, b = 0 → s = −1, the misfit).
    val cents = Seq((0L, axis(0)), (1L, axis(1))).toDF("cell", "cvec")
    val pts = Seq((1L, axis(0), 0L), (2L, axis(1), 1L), (3L, axis(0), 1L))
      .toDF("id", "v", "c")
    val out = Similarity.silhouetteSimplified(pts, $"id", $"v", $"c",
        cents, $"cell", $"cvec")
      .orderBy("cell")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(out === Seq((0L, 1L, 1.0, 0L), (1L, 2L, 0.0, 1L)))
  }

  test("silhouette: a point equidistant to all centroids scores 0") {
    val cents = Seq((0L, axis(0)), (1L, axis(1))).toDF("cell", "cvec")
    val diag = Array(1.0f, 1.0f, 0.0f, 0.0f)
    val pts = Seq((1L, diag, 0L)).toDF("id", "v", "c")
    val out = Similarity.silhouetteSimplified(pts, $"id", $"v", $"c",
        cents, $"cell", $"cvec")
      .as[(Long, Long, Double, Long)].head()
    assert(out === ((0L, 1L, 0.0, 0L)))
  }

  // ——— kmvDistinct ————————————————————————————————————————————————————

  test("kmv: fewer distincts than k returns the EXACT count") {
    val df = Seq("a", "b", "c", "a", "b").toDF("v")
    val r = Sketch.kmvDistinct(df, $"v", k = 16)
      .as[(Long, Long, Option[Double])].head()
    assert(r._1 === 3L && r._3 === Some(3.0))
  }

  test("kmv: estimate lands within the ±3/sqrt(k) band on 20k distincts") {
    val df = spark.range(20000).toDF("v")
    val r = Sketch.kmvDistinct(df, $"v", k = 256)
      .as[(Long, Long, Option[Double])].head()
    assert(r._1 === 256L)
    val est = r._3.get
    // 3 standard errors at k=256 ≈ 18.75%
    assert(est > 20000 * 0.8125 && est < 20000 * 1.1875,
      s"KMV estimate $est outside the 3σ band for 20000 distincts")
  }

  test("kmv: duplicates never change the sketch (distinct-hash law)") {
    val once = spark.range(500).toDF("v")
    val thrice = once.union(once).union(once)
    val a = Sketch.kmvDistinct(once, $"v", 64).collect().toSeq
    val b = Sketch.kmvDistinct(thrice, $"v", 64).collect().toSeq
    assert(a === b)
  }

  test("kmv: the merge law — sketch(A ∪ B) = merge(sketch(A), sketch(B))") {
    val a = spark.range(0, 3000).toDF("v")
    val b = spark.range(2000, 6000).toDF("v") // overlapping ranges
    val k = 64
    val whole = Sketch.kmvEstimate(
      Sketch.kmvState(a.union(b), $"v", k), k).collect().toSeq
    val merged = Sketch.kmvEstimate(Sketch.kmvMergeStates(
      Sketch.kmvState(a, $"v", k), Sketch.kmvState(b, $"v", k), k), k)
      .collect().toSeq
    assert(whole === merged)
  }

  // ——— epochPlan ——————————————————————————————————————————————————————

  test("epochPlan: allocation conserves the budget; damping boosts the tail") {
    // head source: 10 docs × 8 tokens; tail source: 1 doc × 8 tokens —
    // α=0.5 damping must allocate the tail MORE than its natural share
    // (epochs > head's) while Σ alloc ≡ budget exactly
    val docs = ((1 to 10).map(i => ("head", s"a b c d e f g h"))
      :+ (("tail", "a b c d e f g h"))).toDF("src", "t")
    val out = graft.ops.Sampling.epochPlan(docs, $"src", $"t",
        tokenBudget = 1000L)
      .orderBy("source")
      .select("source", "n_tokens", "alloc_tokens", "epochs")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out.map(_._2) === Seq(80L, 8L))
    assert(out.map(_._3).sum === 1000L) // the conservation law
    val (headEp, tailEp) = (out(0)._4, out(1)._4)
    assert(tailEp > headEp,
      s"damping must boost the tail: head=$headEp tail=$tailEp")
    // natural share would give tail 1000/11 ≈ 91 tokens (epochs ~11.4);
    // sqrt damping gives it ~240 (epochs ~30) — check the boost is real
    assert(tailEp > 2.0 * (1000.0 / 88) && headEp < 1000.0 / 88)
  }

  // ——— contentChunks ——————————————————————————————————————————————————

  private val lorem = ("the quick brown fox jumps over the lazy dog and " +
    "then runs far away across the wide river into the dark forest " +
    "where it finally sleeps under an old oak tree until morning " +
    "comes and the hunt begins again as it always does in stories") * 3

  test("chunks: conservation — chunk lengths tile the document exactly") {
    val df = Seq((1L, lorem), (2L, "short"), (3L, "x" * 500))
      .toDF("id", "t")
    val out = TextAnalysis.contentChunks(df, $"id", $"t")
    val sums = out.groupBy("doc_id")
      .agg(sum("chunk_len").as("s"), count(lit(1)).as("n"),
        min("start").as("mn"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(sums.map(r => (r._1, r._2)) ===
      Seq((1L, lorem.length.toLong), (2L, 5L), (3L, 500L)))
    assert(sums.forall(_._4 === 1L)) // every doc starts at position 1
    // chunks reassemble the text verbatim
    val re = out.filter($"doc_id" === 1L).orderBy("chunk_idx")
      .select("start", "chunk_len").as[(Long, Long)].collect()
      .map { case (s, l) => lorem.substring(s.toInt - 1, (s + l - 1).toInt) }
      .mkString
    assert(re === lorem)
  }

  test("chunks: an edit shifts offsets but the stream RE-SYNCS (CDC law)") {
    val orig = TextAnalysis.contentChunks(
      Seq((1L, lorem)).toDF("id", "t"), $"id", $"t")
      .select("chunk_hash").as[String].collect().toSet
    val edited = TextAnalysis.contentChunks(
      Seq((1L, "INSERTED PREFIX >>> " + lorem)).toDF("id", "t"),
      $"id", $"t")
      .select("chunk_hash").as[String].collect().toSet
    // every original chunk past the first boundary reappears verbatim
    // in the edited stream — fixed-size blocking would share ~nothing
    val shared = orig.intersect(edited).size
    assert(shared >= orig.size - 2,
      s"only $shared of ${orig.size} chunks survived a prefix edit")
  }

  test("chunkOverlapPairs: shared boilerplate pairs, disjoint text does not") {
    // docs 1 and 2 share the long boilerplate block (several chunks);
    // doc 3 is disjoint content of the same length — no pair
    val boiler = lorem
    val d1 = boiler + " UNIQUE TAIL ONE"
    val d2 = "DIFFERENT HEAD >>> " + boiler
    val d3 = boiler.reverse
    val df = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("id", "t")
    val out = graft.ops.Dedup.chunkOverlapPairs(df, $"id", $"t")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L)))
  }

  test("chunks: empty and null texts yield zero chunks (empty law)") {
    val df = Seq((1L, ""), (2L, null.asInstanceOf[String])).toDF("id", "t")
    assert(TextAnalysis.contentChunks(df, $"id", $"t").count() === 0L)
  }
}
