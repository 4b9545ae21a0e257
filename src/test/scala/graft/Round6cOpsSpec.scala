package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Eval, Sampling, TextAnalysis}

/** Hand-checked laws for the round-6 batch-C operators: corpus-typicality
  * scoring, the deterministic Poisson bootstrap, and the exact two-sample
  * KS statistic. */
class Round6cOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ——— unigramLmScore ————————————————————————————————————————————————

  test("unigramLmScore: hand-computed probabilities on a 3-doc corpus") {
    // corpus tokens: "a a b" + "a c" → N = 5, f(a) = 3, f(b) = 1, f(c) = 1
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("id", "txt")
    val out = TextAnalysis.unigramLmScore(df, $"id", $"txt")
      .orderBy("doc_id").as[(Long, Long, Double, Double)].collect()
    // doc 1: mean = (3/5 + 3/5 + 1/5)/3 = 7/15; min = 1/5
    assert(out(0)._2 === 3L)
    assert(math.abs(out(0)._3 - 7.0 / 15.0) < 1e-6)
    assert(out(0)._4 === 0.2)
    // doc 2: mean = (3/5 + 1/5)/2 = 2/5; min = 1/5
    assert(out(1)._2 === 2L && out(1)._3 === 0.4 && out(1)._4 === 0.2)
  }

  test("unigramLmScore: a rare-token doc scores below an everyday-token doc") {
    val everyday = (1 to 20).map(i => (i.toLong, "the cat sat"))
    val rare = Seq((99L, "zxqv jkwp"))
    val out = TextAnalysis.unigramLmScore(
        (everyday ++ rare).toDF("id", "txt"), $"id", $"txt")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out(99L) < out(1L))
  }

  // ——— bootstrapReplicate ————————————————————————————————————————————

  test("bootstrapReplicate: deterministic, Poisson(1)-shaped, copy-indexed") {
    val df = (1 to 2000).map(i => (i.toLong, s"d$i")).toDF("id", "s")
    val a = Sampling.bootstrapReplicate(df, $"id")
      .select("id", "copy").as[(Long, Long)].collect().sorted.toSeq
    val b = Sampling.bootstrapReplicate(df, $"id")
      .select("id", "copy").as[(Long, Long)].collect().sorted.toSeq
    assert(a === b)                                   // deterministic
    assert(math.abs(a.length - 2000) < 200)           // E[out] = n ± ~4σ
    // copy indices are dense 0..copies-1 per id
    val byId = a.groupBy(_._1).values
    assert(byId.forall(g => g.map(_._2).sorted == (0 until g.size).map(_.toLong)))
    // replica-count histogram is Poisson(1)-ish: P(0) ≈ P(1) ≈ 0.37
    val counts = a.groupBy(_._1).view.mapValues(_.size).toMap
    val zeros = 2000 - counts.size
    assert(zeros > 500 && zeros < 1000)
    assert(counts.values.count(_ == 1) > 500)
  }

  test("bootstrapReplicate: a row's replica count is stable as the corpus grows") {
    val small = (1 to 100).map(i => (i.toLong, "x")).toDF("id", "s")
    val big = (1 to 1000).map(i => (i.toLong, "x")).toDF("id", "s")
    def hist(df: org.apache.spark.sql.DataFrame) =
      Sampling.bootstrapReplicate(df, $"id").groupBy("id").count()
        .as[(Long, Long)].collect().toMap
    val hs = hist(small)
    val hb = hist(big)
    assert((1 to 100).forall(i => hs.getOrElse(i.toLong, 0L) ===
      hb.getOrElse(i.toLong, 0L)))
  }

  // ——— ksStatistic ———————————————————————————————————————————————————

  test("ksStatistic: identical samples → 0; disjoint supports → 1") {
    val same = Seq((1.0, true), (2.0, true), (1.0, false), (2.0, false))
      .toDF("v", "a")
    val r1 = Eval.ksStatistic(same, $"v", $"a")
      .as[(Long, Long, Option[Double])].head()
    assert(r1 === ((2L, 2L, Some(0.0))))
    val disjoint = Seq((1.0, true), (2.0, true), (10.0, false), (11.0, false))
      .toDF("v", "a")
    val r2 = Eval.ksStatistic(disjoint, $"v", $"a")
      .as[(Long, Long, Option[Double])].head()
    assert(r2._3 === Some(1.0))
  }

  test("ksStatistic: hand-computed D on an interleaved sample with ties") {
    // A = {1, 2, 3}, B = {2, 4}: at v=1 |1/3 − 0| = 1/3; v=2 |2/3 − 1/2|
    // = 1/6; v=3 |1 − 1/2| = 1/2; v=4 |1 − 1| = 0 → D = 1/2
    val df = Seq((1.0, true), (2.0, true), (3.0, true),
      (2.0, false), (4.0, false)).toDF("v", "a")
    val r = Eval.ksStatistic(df, $"v", $"a")
      .as[(Long, Long, Option[Double])].head()
    assert(r._1 === 3L && r._2 === 2L && r._3 === Some(0.5))
  }

  test("ksStatistic: empty cohort → null, counts still reported") {
    val df = Seq((1.0, true), (2.0, true)).toDF("v", "a")
    val r = Eval.ksStatistic(df, $"v", $"a")
      .as[(Long, Long, Option[Double])].head()
    assert(r === ((2L, 0L, None)))
  }
}
