package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Graph, Profile, Sampling, TextAnalysis}

/** Hand-checked laws for the round-5 session-2 operators: triangle
  * counting, token PMI, covariance. */
class Round5OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("triangleCounts: counts, degrees, clustering on a hand graph") {
    // triangle 1-2-3 plus pendant 4 off node 3; duplicates, reversals and
    // a self-loop must all collapse
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 4L),
      (3L, 4L), (4L, 4L)).toDF("s", "d")
    val out = Graph.triangleCounts(edges, $"s", $"d")
      .orderBy("node")
      .select("node", "degree", "n_triangles", "clustering")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 3L, 1L), (4L, 1L, 0L)))
    assert(out(0)._4 === 1.0) // deg 2, 1 triangle
    assert(math.abs(out(2)._4 - 1.0 / 3.0) < 1e-12) // 2*1/(3*2)
    assert(out(3)._4 === 0.0) // degree-1 convention
  }

  test("triangleCounts: two shared triangles credit the shared edge's nodes") {
    // K4 minus one edge: triangles (1,2,3) and (1,2,4); edge 1-2 shared
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("s", "d")
    val out = Graph.triangleCounts(edges, $"s", $"d")
      .select("node", "n_triangles").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("tokenPmi: exact counts and the ln-ratio on a hand corpus") {
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a b c"), (4L, "c d")).toDF("id", "text")
    val out = TextAnalysis.tokenPmi(docs, $"id", $"text", minSupport = 1L)
      .orderBy("token_a", "token_b")
      .select("token_a", "token_b", "n_ab", "n_a", "n_b", "pmi")
      .as[(String, String, Long, Long, Long, Double)].collect()
    val byPair = out.map(r => ((r._1, r._2), r)).toMap
    // (a,b) in 3 docs of 4; df(a)=3, df(b)=3 → pmi = ln(3*4/9)
    val ab = byPair(("a", "b"))
    assert(ab._3 === 3L && ab._4 === 3L && ab._5 === 3L)
    assert(math.abs(ab._6 - math.log(12.0 / 9.0)) < 1e-12)
    // (c,d) once; df(c)=2, df(d)=1 → ln(4/2)
    val cd = byPair(("c", "d"))
    assert(cd._3 === 1L && math.abs(cd._6 - math.log(2.0)) < 1e-12)
    // b and d never co-occur → absent, and token order is always a < b
    assert(!byPair.contains(("b", "a")) && !byPair.contains(("b", "d")))
  }

  test("tokenPmi: single-token and repeated-token docs contribute no pairs") {
    val docs = Seq((1L, "solo"), (2L, "dup dup dup")).toDF("id", "text")
    assert(TextAnalysis.tokenPmi(docs, $"id", $"text", minSupport = 1L)
      .count() === 0L)
  }

  test("skipgramPmi: window pairs, occurrence counts, and the ln-ratio") {
    // "a b a": window 2 pairs = (a,b),(a,b)... offsets: k=1 → (a,b),(a,b)
    // [least/greatest], k=2 → (a,a); plus doc "c b" → (b,c)
    val docs = Seq((1L, "a b a"), (2L, "c b")).toDF("id", "text")
    val out = TextAnalysis.skipgramPmi(docs, $"text",
        window = 2, minSupport = 1L)
      .select("token_a", "token_b", "n_ab", "n_a", "n_b", "pmi")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => ((r._1, r._2), r)).toMap
    // Nt = 5 tokens, Np = 4 pairs
    val ab = out(("a", "b"))
    assert(ab._3 === 2L && ab._4 === 2L && ab._5 === 2L)
    assert(math.abs(ab._6 - math.log(2.0 * 25 / (2.0 * 2 * 4))) < 1e-12)
    val aa = out(("a", "a"))
    assert(aa._3 === 1L && math.abs(aa._6 - math.log(25.0 / 16.0)) < 1e-12)
    assert(out(("b", "c"))._3 === 1L && out.size === 3)
  }

  test("covarianceMatrix: hand-checked population covariance per group") {
    // group g: vectors (1,2) and (3,6) → means (2,4);
    // cov(0,0) = (1+9)/2 - 4 = 1; cov(0,1) = (2+18)/2 - 8 = 2;
    // cov(1,1) = (4+36)/2 - 16 = 4
    val df = Seq(("g", Seq(1.0f, 2.0f)), ("g", Seq(3.0f, 6.0f)))
      .toDF("label", "embedding")
    val out = Profile.covarianceMatrix(df, $"label", $"embedding")
      .orderBy("i", "j")
      .select("i", "j", "n_terms", "cov")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq === Seq((0L, 0L, 2L, 1.0), (0L, 1L, 2L, 2.0),
      (1L, 1L, 2L, 4.0)))
  }

  test("powerIteration: converges toward the dominant axis of a diagonal gram") {
    // vectors (1,0) and (0,2): gram = [[1,0],[0,4]] → top eigenvector
    // (0,1), eigenvalue 4; two rounds from (1,1) already lean heavily in
    val df = Seq(("g", Seq(1.0f, 0.0f)), ("g", Seq(0.0f, 2.0f)))
      .toDF("label", "embedding")
    val out = Profile.powerIteration(df, $"label", $"embedding", iters = 2)
      .orderBy("dim").select("dim", "component", "eigenvalue")
      .as[(Long, Double, Double)].collect()
    assert(out.length === 2)
    assert(out(1)._2 > 0.99 && out(0)._2 > 0.0 && out(0)._2 < 0.1)
    assert(out(1)._3 > 3.5 && out(1)._3 <= 4.0)
    // unit norm after the final normalize
    val nrm = math.sqrt(out.map(r => r._2 * r._2).sum)
    assert(math.abs(nrm - 1.0) < 1e-9)
  }

  test("degreeAssortativity: a star graph is perfectly disassortative") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("s", "d")
    val out = Graph.degreeAssortativity(edges, $"s", $"d")
      .select("n_edges", "assortativity").as[(Long, Double)].head()
    assert(out._1 === 6L) // both orientations
    assert(math.abs(out._2 - (-1.0)) < 1e-12)
  }

  test("curriculumInterleave: tiers alternate and the top tier clamps") {
    val docs = Seq((1L, 0.1), (2L, 0.3), (3L, 0.6), (4L, 0.9), (5L, 1.0))
      .toDF("id", "sc")
    val out = Sampling.curriculumInterleave(docs, $"id", $"sc", tiers = 4)
      .orderBy("position").select("doc_id", "tier", "position")
      .as[(Long, Long, Long)].collect()
    // tiers: 0,1,2,3,3 (score 1.0 clamps to the top tier)
    assert(out.toSeq === Seq((1L, 0L, 0L), (2L, 1L, 1L), (3L, 2L, 2L),
      (4L, 3L, 3L), (5L, 3L, 7L)))
    // positions strictly increase → a valid total training order
    assert(out.map(_._3).toSeq === out.map(_._3).sorted.toSeq)
  }

  test("allocateBudget: exact conservation and largest-remainder ties") {
    val w = Seq(("a", 1.0), ("b", 1.0), ("c", 1.0)).toDF("k", "w")
    val out = Sampling.allocateBudget(w, $"k", $"w", total = 10L)
      .select("key", "alloc").as[(String, Long)].collect().toMap
    assert(out.values.sum === 10L)
    assert(out === Map("a" -> 4L, "b" -> 3L, "c" -> 3L)) // frac tie → key order
    val w2 = Seq(("a", 0.5), ("b", 0.3), ("c", 0.2)).toDF("k", "w")
    val out2 = Sampling.allocateBudget(w2, $"k", $"w", total = 10L)
      .select("key", "alloc").as[(String, Long)].collect().toMap
    assert(out2 === Map("a" -> 5L, "b" -> 3L, "c" -> 2L))
    assert(out2.values.sum === 10L)
  }

  test("covarianceMatrix: constant dimension has zero variance and covariance") {
    val df = Seq(("g", Seq(5.0f, 1.0f)), ("g", Seq(5.0f, 3.0f)))
      .toDF("label", "embedding")
    val out = Profile.covarianceMatrix(df, $"label", $"embedding")
      .select("i", "j", "cov").as[(Long, Long, Double)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    assert(out((0L, 0L)) === 0.0 && out((0L, 1L)) === 0.0)
    assert(out((1L, 1L)) === 1.0)
  }
}
