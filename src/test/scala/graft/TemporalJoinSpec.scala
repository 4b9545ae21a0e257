package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TemporalJoin

class TemporalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // trades (left) and quotes (right) — the canonical as-of shape
  private lazy val trades = Seq(
    (1L, "A", ts("2024-01-01 10:00:00")),
    (2L, "A", ts("2024-01-01 10:05:00")),
    (3L, "B", ts("2024-01-01 10:01:00")),
    (4L, "C", ts("2024-01-01 10:00:00"))) // no quotes at all
    .toDF("trade_id", "sym", "t")

  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 09:59:00"), 10.0),
    ("A", ts("2024-01-01 10:05:00"), 11.0), // equal ts: visible to trade 2
    ("B", ts("2024-01-01 10:02:00"), 20.0)) // after trade 3: not visible
    .toDF("qsym", "qt", "price")

  test("asOfJoin picks the latest right row at or before each left row") {
    val out = TemporalJoin.asOfJoin(
      trades, Seq("sym"), col("t"),
      quotes, Seq("qsym"), col("qt"),
      Map("price" -> col("price")))
      .select("trade_id", "price").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L) === Some(10.0)) // 09:59 quote
    assert(out(2L) === Some(11.0)) // equal-timestamp quote wins (>= semantics)
    assert(out(3L) === None)       // only future quotes for B
    assert(out(4L) === None)       // key never quoted
  }

  test("asOfJoin carries a matched row's NULL value (not an older non-null one)") {
    // latest quote at/before the trade has a NULL price — the carry must be
    // that NULL, not the older 10.0 (regression: per-column last(ignoreNulls)
    // skipped genuine nulls exactly like the union placeholders)
    val quotesWithNull = Seq(
      ("A", ts("2024-01-01 09:59:00"), Some(10.0)),
      ("A", ts("2024-01-01 10:04:00"), None: Option[Double]))
      .toDF("qsym", "qt", "price")
    val out = TemporalJoin.asOfJoin(
      trades.filter($"trade_id" === 2L), Seq("sym"), col("t"),
      quotesWithNull, Seq("qsym"), col("qt"),
      Map("price" -> col("price")))
      .select("trade_id", "price").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(2L) === None)
    // and the native operator agrees
    val native = graft.plans.AsOfJoin.asOf(
      trades.filter($"trade_id" === 2L), Seq("sym"), "t",
      quotesWithNull, Seq("qsym"), "qt", Seq("price"))
      .select("trade_id", "price").as[(Long, Option[Double])]
      .collect().toMap
    assert(native(2L) === None)
  }

  test("asOfJoin rejects carry names colliding with left columns") {
    intercept[IllegalArgumentException] {
      TemporalJoin.asOfJoin(trades, Seq("sym"), col("t"),
        quotes, Seq("qsym"), col("qt"), Map("t" -> col("price")))
    }
  }

  test("asOfJoin preserves left cardinality") {
    val out = TemporalJoin.asOfJoin(
      trades, Seq("sym"), col("t"),
      quotes, Seq("qsym"), col("qt"),
      Map("price" -> col("price")))
    assert(out.count() === trades.count())
    assert(out.columns.toSeq === Seq("trade_id", "sym", "t", "price"))
  }

  test("rangeJoinKeyed matches rows in the half-open window") {
    // quotes within [t - 2 min, t) of each trade
    val out = TemporalJoin.rangeJoinKeyed(
      trades, Seq("sym"), "t",
      quotes, Seq("qsym"), "qt",
      expr("INTERVAL -2 MINUTE"), expr("INTERVAL 0 SECOND"), "left")
      .groupBy("trade_id").agg(count(col("price")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) === 1L) // 09:59 within [09:58, 10:00)
    assert(out(2L) === 0L) // 10:05 quote excluded: window is half-open at t
    assert(out(3L) === 0L)
    assert(out(4L) === 0L)
  }

  test("intervalJoinBinned equals the naive theta-join across bin widths") {
    val intervals = Seq(
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:04:00")),
      (101L, ts("2024-01-01 10:03:00"), ts("2024-01-01 10:10:00")), // overlaps 100
      (102L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:01:00"))) // empty
      .toDF("interval_id", "lo", "hi")
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")),  // on lo boundary: included
      (2L, ts("2024-01-01 10:03:30")),  // inside both 100 and 101
      (3L, ts("2024-01-01 10:04:00")),  // on hi boundary of 100: excluded there
      (4L, ts("2024-01-01 11:00:00")))  // in none
      .toDF("point_id", "pt")
    val naive = intervals.join(points,
        col("pt") >= col("lo") && col("pt") < col("hi"))
      .select("interval_id", "point_id").as[(Long, Long)].collect().toSet
    for (binMicros <- Seq(30L * 1000000, 60L * 1000000, 3600L * 1000000)) {
      val binned = TemporalJoin.intervalJoinBinned(
        points, col("pt"), intervals, col("lo"), col("hi"), binMicros)
        .select("interval_id", "point_id").as[(Long, Long)].collect().toSet
      assert(binned === naive, s"binMicros=$binMicros")
    }
    assert(naive === Set((100L, 1L), (100L, 2L), (101L, 2L), (101L, 3L)))
  }
}
