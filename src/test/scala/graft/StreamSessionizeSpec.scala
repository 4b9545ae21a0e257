package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streaming

class StreamSessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("flatMapGroupsWithState sessionization closes sessions by gap and by timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long)]
    val sessions = Streaming.sessionizeStream(
      input.toDF.toDF("user_id", "ts", "event_id"),
      gapMinutes = 30, watermark = "1 minute")
    val q = sessions.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_test").start()
    try {
      // batch 1: user 1 has two events 10 min apart (one session), then a
      // third event 2 hours later the SAME batch — closes the first session
      // by gap within the fold
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), 1L),
        (1L, ts("2024-01-01 10:10:00"), 2L),
        (1L, ts("2024-01-01 12:00:00"), 3L))
      q.processAllAvailable()
      val afterBatch1 = spark.table("sess_test")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(afterBatch1.map(t => (t._1, t._4)) === Set((1L, 2L))) // 2-event session closed
      // batch 2: far-future event for user 2 pushes the watermark past
      // user 1's open session + gap -> session 3 closes via TIMEOUT
      input.addData((2L, ts("2024-01-01 23:00:00"), 9L))
      q.processAllAvailable()
      // one more batch so the timeout fires with the advanced watermark
      input.addData((2L, ts("2024-01-01 23:00:01"), 10L))
      q.processAllAvailable()
      val all = spark.table("sess_test").as[(Long, Long, Long, Long)].collect().toSet
      assert(all.exists(t => t._1 == 1L && t._4 == 1L),
        s"timeout-closed single-event session missing: $all")
    } finally q.stop()
  }

  test("late in-gap events extend the open session instead of rewinding it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long)]
    val sessions = Streaming.sessionizeStream(
      input.toDF.toDF("user_id", "ts", "event_id"),
      gapMinutes = 30, watermark = "10 minutes")
    val q = sessions.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_late").start()
    try {
      input.addData((3L, ts("2024-01-01 10:00:00"), 1L))
      q.processAllAvailable()
      // late but within the 10-min watermark AND within the gap: must join
      // the open session (extending start), not rewind last_us
      input.addData((3L, ts("2024-01-01 09:59:00"), 2L))
      q.processAllAvailable()
      // far-future events close user 3's session via timeout
      input.addData((9L, ts("2024-01-01 23:00:00"), 8L))
      q.processAllAvailable()
      input.addData((9L, ts("2024-01-01 23:00:01"), 9L))
      q.processAllAvailable()
      val sess3 = spark.table("sess_late")
        .as[(Long, Long, Long, Long)].collect().filter(_._1 == 3L)
      assert(sess3.length === 1, sess3.mkString(","))
      val (_, start, end, n) = sess3.head
      assert(n === 2L)
      assert(start === ts("2024-01-01 09:59:00").getTime * 1000L)
      assert(end === ts("2024-01-01 10:00:00").getTime * 1000L,
        "late event rewound the session end")
    } finally q.stop()
  }

  test("stream-stream range join matches keys within the lookback window") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val joined = Streaming.streamStreamRangeJoin(
      purchases.toDF.toDF("p_user", "p_ts", "p_id"), "p_user", "p_ts",
      clicks.toDF.toDF("c_user", "c_ts", "c_id"), "c_user", "c_ts",
      lookback = "1 hour", watermark = "5 minutes")
      .select("p_id", "c_id")
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_test").start()
    try {
      clicks.addData(
        (1L, ts("2024-01-01 10:00:00"), 100L),  // within 1h of purchase
        (1L, ts("2024-01-01 08:00:00"), 101L),  // too old
        (2L, ts("2024-01-01 10:20:00"), 102L))  // other user
      purchases.addData((1L, ts("2024-01-01 10:30:00"), 1L))
      q.processAllAvailable()
      val got = spark.table("ssj_test").as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 100L)))
    } finally q.stop()
  }
}
