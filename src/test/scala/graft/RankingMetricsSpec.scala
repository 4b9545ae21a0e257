package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Eval

/** Hand-computed fixtures for [[Eval.rankingMetrics]] (q213's operator):
  * AP@k is the mean of precision-at-each-hit over min(|truth|, k); NDCG@k
  * uses the injected 1/log2(r+1) discount table. The oracle gate proves
  * cross-engine equality; this spec pins the METRIC DEFINITIONS against
  * worked examples (a wrong normalizer would still hash-match a wrong
  * oracle).
  */
class RankingMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(ret: Seq[(Long, Long, Long)],
                  tru: Seq[(Long, Long)]): Map[Long, (Long, Long, Option[Double], Option[Double])] =
    Eval.rankingMetrics(
        ret.toDF("query_id", "item_id", "rank"),
        tru.toDF("query_id", "item_id"), k = 5)
      .collect().map { r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      }.toMap

  test("perfect ranking: ap = ndcg = 1") {
    val out = run(
      (1L to 5L).map(r => (1L, 100L + r, r)),
      (1L to 5L).map(r => (1L, 100L + r)))
    val (n, hits, ap, ndcg) = out(1L)
    assert(n === 5L && hits === 5L)
    assert(ap.get === 1.0 && ndcg.get === 1.0)
  }

  test("hits at ranks 1 and 3 of 2 relevant: ap = (1/1 + 2/3) / 2") {
    // truth = {101, 103}; retrieved ranks 1..5 hit at 1 and 3
    val out = run(
      Seq((1L, 101L, 1L), (1L, 202L, 2L), (1L, 103L, 3L),
        (1L, 204L, 4L), (1L, 205L, 5L)),
      Seq((1L, 101L), (1L, 103L)))
    val (_, hits, ap, ndcg) = out(1L)
    assert(hits === 2L)
    assert(math.abs(ap.get - (1.0 + 2.0 / 3.0) / 2.0) < 1e-6)
    // dcg = 1/log2(2) + 1/log2(4); idcg = 1/log2(2) + 1/log2(3)
    val expect = (1.0 + 1.0 / 2.0) / (1.0 + 1.0 / (math.log(3) / math.log(2)))
    assert(math.abs(ndcg.get - expect) < 1e-6)
  }

  test("zero hits: ap = ndcg = 0; no truth at all: both null") {
    val out = run(
      Seq((1L, 900L, 1L), (1L, 901L, 2L), (2L, 902L, 1L)),
      Seq((1L, 101L)))
    assert(out(1L)._3.get === 0.0 && out(1L)._4.get === 0.0)
    assert(out(2L)._3.isEmpty && out(2L)._4.isEmpty)
  }

  test("more truth than k normalizes by k") {
    // 7 relevant, k=5, all 5 retrieved are hits: ap = (Σ r/r)/5 = 1
    val out = run(
      (1L to 5L).map(r => (1L, 100L + r, r)),
      (1L to 7L).map(i => (1L, 100L + i)))
    assert(out(1L)._3.get === 1.0 && out(1L)._4.get === 1.0)
  }
}
