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

  // ——— AVI container codec ————————————————————————————————————————————

  test("AviDibCodec: encode→decode round-trips every pixel, both row orders") {
    import graft.ops.Multimodal
    val w = 5; val h = 3
    val f0 = Array.tabulate(w * h)(i => ((i * 37 + 11) % 256 << 16) |
      ((i * 53 + 7) % 256 << 8) | ((i * 91 + 3) % 256))
    val f1 = f0.map(p => (p + 0x010101) & 0xffffff)
    val avi = Multimodal.encodeAviRgb(Seq(f0, f1), w, h)
    val dec = Multimodal.AviDibCodec.newDecoder()(avi)
    assert(dec.length === 2)
    assert(dec(0)._1 === w && dec(0)._2 === h)
    assert(dec(0)._3.toSeq === f0.toSeq)
    assert(dec(1)._3.toSeq === f1.toSeq)
  }

  test("AviDibCodec: garbage, truncation and wrong depth degrade to 0 frames") {
    import graft.ops.Multimodal
    val dec = Multimodal.AviDibCodec.newDecoder()
    assert(dec(null).isEmpty)
    assert(dec(Array[Byte](1, 2, 3)).isEmpty)
    assert(dec("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    val good = Multimodal.encodeAviRgb(
      Seq(Array.fill(4)(0x102030)), 2, 2)
    assert(dec(good).length === 1)
    assert(dec(good.dropRight(5)).isEmpty) // truncated movi frame
  }

  test("decodeVideo fans frames inside partitions; stats are exact") {
    import graft.ops.Multimodal
    val w = 4; val h = 2
    val frame = Array.tabulate(w * h)(i => (i << 16) | ((2 * i) << 8) | 3 * i)
    val avi = Multimodal.encodeAviRgb(Seq(frame), w, h)
    val assets = Seq((1L, avi)).toDF("asset_id", "payload")
    val r = Multimodal.frameRgbStats(
        Multimodal.decodeVideo(assets, Multimodal.AviDibCodec))
      .head()
    assert(r.getAs[Int]("width") === w && r.getAs[Int]("height") === h)
    assert(r.getAs[Long]("sum_r") === (0 until 8).map(_.toLong).sum)
    assert(r.getAs[Long]("sum_g") === (0 until 8).map(i => 2L * i).sum)
    assert(r.getAs[Long]("sum_b") === (0 until 8).map(i => 3L * i).sum)
  }

  // ——— dim-tiled gram ——————————————————————————————————————————————————

  test("gramMatrixTiled == gramMatrix on ragged dims and odd tile splits") {
    import graft.ops.Profile
    val vecs = Seq(
      (1L, "a", Array(1.0f, 2.0f, 3.0f, 4.0f, 5.0f)),
      (2L, "a", Array(0.5f, -1.0f, 2.5f, -3.0f, 1.0f)),
      (3L, "b", Array(1.5f, 0.25f, -0.75f, 2.0f, -1.0f)),
      (4L, "b", Array(-2.0f, 1.0f, 0.0f, 0.5f, 3.0f)))
      .toDF("id", "g", "v")
    // tile = 2 over d = 5: a ragged final tile exercises the least()
    // bounds; the two generators must agree cell-for-cell
    val flat = Profile.gramMatrix(vecs, $"g", $"v")
      .orderBy("group_key", "i", "j").collect().map(_.toSeq)
    val tiled = Profile.gramMatrixTiled(vecs, $"g", $"v", tile = 2)
      .orderBy("group_key", "i", "j").collect().map(_.toSeq)
    assert(tiled.toSeq === flat.toSeq)
    assert(flat.length === 2 * 15) // 2 groups × d(d+1)/2
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
