package graft

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TemporalJoin
import graft.plans.AsOfJoin

class AsOfJoinNativeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, "A", ts("2024-01-01 10:00:00")),
    (2L, "A", ts("2024-01-01 10:05:00")),
    (3L, "B", ts("2024-01-01 10:01:00")),
    (4L, "C", ts("2024-01-01 10:00:00")))
    .toDF("trade_id", "sym", "t")

  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 09:59:00"), 10.0),
    ("A", ts("2024-01-01 10:05:00"), 11.0),
    ("B", ts("2024-01-01 10:02:00"), 20.0))
    .toDF("qsym", "qt", "price")

  test("native as-of join picks the latest right row at or before each left row") {
    val out = AsOfJoin.asOf(trades, Seq("sym"), "t",
      quotes, Seq("qsym"), "qt", Seq("price"))
      .select("trade_id", "price").as[(Long, Option[Double])]
      .collect().toMap
    assert(out === Map(
      1L -> Some(10.0), 2L -> Some(11.0), 3L -> None, 4L -> None))
  }

  test("the physical plan contains AsOfJoinExec (strategy fired)") {
    val df = AsOfJoin.asOf(trades, Seq("sym"), "t",
      quotes, Seq("qsym"), "qt", Seq("price"))
    df.collect() // force planning through AQE
    // SparkPlan.nodeName strips the "Exec" suffix: the node prints as
    // "AsOfJoin [keys]..." inside the (adaptive) executed plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
  }

  test("native as-of join agrees with the union-and-window formulation on random data") {
    val rnd = new Random(42)
    val base = ts("2024-01-01 00:00:00").getTime
    val leftRows = (1 to 2000).map { i =>
      (i.toLong, rnd.nextInt(7).toLong, new Timestamp(base + rnd.nextInt(100000) * 1000L))
    }
    // unique per (key, time) by construction: distinct slots per key
    val rightRows = (1 to 1500).map { j =>
      (j.toLong, rnd.nextInt(7).toLong, new Timestamp(base + rnd.nextInt(100000) * 1000L))
    }.distinctBy(r => (r._2, r._3.getTime))
    val l = leftRows.toDF("lid", "k", "t")
    val r = rightRows.toDF("rid", "rk", "rt")
    val native = AsOfJoin.asOf(l, Seq("k"), "t", r, Seq("rk"), "rt", Seq("rid"))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    val composed = TemporalJoin.asOfJoin(l, Seq("k"), col("t"),
      r, Seq("rk"), col("rt"), Map("rid" -> col("rid")))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(native.size === 2000)
    assert(native === composed)
  }

  test("empty right side yields all-null carry, preserved left cardinality") {
    val out = AsOfJoin.asOf(trades, Seq("sym"), "t",
      quotes.filter(lit(false)), Seq("qsym"), "qt", Seq("price"))
      .select("trade_id", "price").as[(Long, Option[Double])]
      .collect().toMap
    assert(out.size === 4 && out.values.forall(_.isEmpty))
  }

  test("GraftExtensions injects the as-of strategy via spark.sql.extensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    val strategies = org.apache.spark.sql.graftbridge.PlanBridge
      .plannerStrategies(ext, spark)
    assert(strategies.exists(_.isInstanceOf[graft.plans.AsOfJoinStrategy]),
      strategies.map(_.getClass.getName).mkString(", "))
  }

  test("rejects mismatched key types and unknown columns") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(trades, Seq("sym"), "t", quotes, Seq("qsym"), "qt", Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(trades, Seq("trade_id"), "t", quotes, Seq("qsym"), "qt", Seq("price"))
    }
  }
}
