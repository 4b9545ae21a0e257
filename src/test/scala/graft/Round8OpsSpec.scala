package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextAnalysis

/** Hand-checked laws for the round-8 hardenings: the two Luhn scan
  * contracts an advisor proved gate-invisible (formatted-card collapse,
  * distinct-run checksum), and the null-group retention of the banded
  * prefix-sum's group joins.
  */
class Round8OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ——— Luhn contracts (round-8 ADVICE) ————————————————————————————————

  test("luhnCardScan: space/dash-formatted cards are candidates") {
    val docs = Seq(
      (1L, "visa 4111 1111 1111 1111 ok"),
      (2L, "visa 4111-1111-1111-1111 ok"),
      (3L, "mixed 4111-1111 1111-1111 ok"))
      .toDF("id", "text")
    val got = TextAnalysis.luhnCardScan(docs, $"id", $"text")
      .select($"doc_id", $"run", $"luhn_ok")
      .as[(Long, String, Boolean)].collect().toSet
    assert(got === Set(
      (1L, "4111111111111111", true),
      (2L, "4111111111111111", true),
      (3L, "4111111111111111", true)))
  }

  test("luhnCardScan: a repeated run is checksummed ONCE (the m-fold trap)") {
    // single-run Luhn sum of 4111111111111116 is ≡ 5 (mod 10) — summed
    // twice it lands ≡ 0 and the pre-fix code falsely validated it
    val docs = Seq(
      (1L, "bad 4111111111111116 again 4111111111111116 twice"))
      .toDF("id", "text")
    val got = TextAnalysis.luhnCardScan(docs, $"id", $"text")
      .select($"doc_id", $"run", $"luhn_ok")
      .as[(Long, String, Boolean)].collect().toSet
    assert(got === Set((1L, "4111111111111116", false)))
  }

  test("luhnCardScan: repeated VALID run stays valid and appears once") {
    val docs = Seq(
      (1L, "pay 4532015112830366 and 4532015112830366 zz"))
      .toDF("id", "text")
    val got = TextAnalysis.luhnCardScan(docs, $"id", $"text")
      .select($"doc_id", $"run", $"luhn_ok")
      .as[(Long, String, Boolean)].collect().toList
    assert(got === List((1L, "4532015112830366", true)))
  }

  // ——— null-group retention in the banded device ——————————————————————

  test("binaryAucBy: a NULL group key is retained, not dropped") {
    val scored = Seq(
      (Some("a"), 0.9, 1), (Some("a"), 0.1, 0),
      (None: Option[String], 0.8, 1), (None: Option[String], 0.2, 0))
      .toDF("g", "score", "label")
    val got = graft.ops.Eval.binaryAucBy(scored, $"g", $"score",
      $"label" === 1)
    assert(got.count() === 2L, "both groups (incl. NULL) must survive")
    val nullRow = got.filter($"group".isNull).collect()
    assert(nullRow.length === 1)
    assert(nullRow(0).getAs[Double]("auc") === 1.0d)
  }
}
