package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Watermarked Append-mode daily counts (round-7 q236 restatement):
  * closed days emit exactly once and match the batch aggregation, and —
  * the property the r6 Complete-mode form lacked — their state is
  * EVICTED: after the flush batch, the store retains only the sentinel's
  * still-open window, not one row per (key, day) of stream history.
  */
class AppendStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dailyCountsStream: closed days emit once, equal batch, and evict") {
    val dir = java.nio.file.Files.createTempDirectory("graft_appendstream")
    val src = dir.resolve("src").toString
    def day(d: Int, h: Int) =
      Timestamp.valueOf(f"2026-01-$d%02d $h%02d:00:00")
    val rows = Seq(
      ("a", day(1, 1)), ("a", day(1, 5)), ("b", day(1, 9)),
      ("a", day(2, 3)), ("b", day(2, 4)), ("b", day(2, 5)),
      ("a", day(3, 7)))
    // two real files + the flush file, mtime-forced into that order —
    // a flush-first replay would mark every real row late and drop it
    rows.take(4).toDF("k", "ts").coalesce(1).write.mode("append").parquet(src)
    rows.drop(4).toDF("k", "ts").coalesce(1).write.mode("append").parquet(src)
    def parts = new java.io.File(src).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSet
    val real = parts
    Seq(("__flush", Timestamp.valueOf("2026-03-01 00:00:00")))
      .toDF("k", "ts").coalesce(1).write.mode("append").parquet(src)
    val base = real.map(p => new java.io.File(p).lastModified).max
    (parts -- real).foreach { p =>
      assert(new java.io.File(p).setLastModified(base + 120000L),
        s"cannot force mtime for $p")
    }
    val schema = spark.read.parquet(src).schema
    val stream = graft.streaming.Streaming.dailyCountsStream(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src),
      col("k"), col("ts"), watermarkDelay = "1 day")
    val q = stream.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("append_daily").start()
    q.processAllAvailable()
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()
    val landed = spark.table("append_daily")
      .filter(col("key") =!= "__flush")
      .orderBy("key", "day").as[(String, String, Long)].collect().toSeq
    // exactly the batch dailyCounts fold, every real day closed and
    // emitted once
    assert(landed === Seq(
      ("a", "2026-01-01", 2L), ("a", "2026-01-02", 1L),
      ("a", "2026-01-03", 1L),
      ("b", "2026-01-01", 1L), ("b", "2026-01-02", 2L)))
    // eviction: the store holds ONLY the sentinel's open window — a
    // Complete-mode aggregation would still hold all 5 closed (key, day)
    // rows here, and would keep growing with stream age
    assert(stateRows === 1L,
      s"state retained $stateRows rows; closed days were not evicted")
  }
}
