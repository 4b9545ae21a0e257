package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Multimodal, Similarity, Timeseries}
import graft.streaming.Streaming

/** Hand-checked laws for the round-6 batch-B operators: DBSCAN-within-
  * blocks triage, the md5-PCM audio decode → frame-energy pipeline, and
  * the streamed EWMA fold vs its batch twin. */
class Round6bOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Orthogonal one-hot helpers: cosine(same axis) = 1, cross-axis = 0.
  private def axis(i: Int, scale: Float = 1.0f): Array[Float] = {
    val a = Array.fill(4)(0.0f); a(i) = scale; a
  }

  test("dbscanBlocks: dense axis cluster is core, lone attached point border, rest noise") {
    // vectors 1..3 on axis 0 (pairwise cosine 1 → each has 2 neighbors →
    // core at minPts=3); vector 4 on axis 1 with a single partner 5 on
    // axis 1 — 1 neighbor each, neither core, no core neighbor → noise;
    // vector 6 alone on axis 2 → zero pairs → noise
    val e = Seq(
      (1L, axis(0)), (2L, axis(0, 2.0f)), (3L, axis(0, 0.5f)),
      (4L, axis(1)), (5L, axis(1, 3.0f)), (6L, axis(2))
    ).toDF("id", "v").withColumn("blk", lit(0))
    val out = Similarity.dbscanBlocks(e, $"id", $"v", Seq($"blk"),
        minCosine = 0.9, minPts = 3)
      .orderBy("node").as[(Long, String, Option[Long], Long)].collect().toSeq
    assert(out === Seq(
      (1L, "core", Some(1L), 2L), (2L, "core", Some(1L), 2L),
      (3L, "core", Some(1L), 2L),
      (4L, "noise", None, 1L), (5L, "noise", None, 1L),
      (6L, "noise", None, 0L)))
  }

  test("dbscanBlocks: borders attach through a core hub they can see") {
    // geometry at minCosine 0.7: clique {1,2,3,4} on axis 0 (cos 1),
    // trio {7,8,9} on axis 1 (cos 1), hub 5 = (1,1,0,0) at cos ≈ .707 to
    // BOTH axes. Neighbor counts incl. self: axis-0 members 5 (clique +
    // hub), hub 8, axis-1 members 4. At minPts = 5 the clique and hub
    // are core, the trio is NOT (one short) — but it sees the core hub,
    // so all three become borders adopting the hub's cluster, which is
    // the clique+hub component labeled min id 1.
    val hub = Array(1.0f, 1.0f, 0.0f, 0.0f)
    val e = Seq(
      (1L, axis(0)), (2L, axis(0)), (3L, axis(0)), (4L, axis(0)),
      (5L, hub),
      (7L, axis(1)), (8L, axis(1)), (9L, axis(1))
    ).toDF("id", "v").withColumn("blk", lit(0))
    val out = Similarity.dbscanBlocks(e, $"id", $"v", Seq($"blk"),
        minCosine = 0.7, minPts = 5)
      .orderBy("node").as[(Long, String, Option[Long], Long)].collect().toSeq
    assert(out === Seq(
      (1L, "core", Some(1L), 4L), (2L, "core", Some(1L), 4L),
      (3L, "core", Some(1L), 4L), (4L, "core", Some(1L), 4L),
      (5L, "core", Some(1L), 7L),
      (7L, "border", Some(1L), 3L), (8L, "border", Some(1L), 3L),
      (9L, "border", Some(1L), 3L)))
  }

  test("dbscanBlocks: block key partitions the pair space — no cross-block cluster") {
    val e = Seq((1L, axis(0), 0), (2L, axis(0), 0), (3L, axis(0), 0),
      (4L, axis(0), 1), (5L, axis(0), 1), (6L, axis(0), 1))
      .toDF("id", "v", "blk")
    val out = Similarity.dbscanBlocks(e, $"id", $"v", Seq($"blk"),
        minCosine = 0.9, minPts = 3)
      .orderBy("node").as[(Long, String, Option[Long], Long)].collect().toSeq
    assert(out.map(_._3) === Seq(Some(1L), Some(1L), Some(1L),
      Some(4L), Some(4L), Some(4L)))
  }

  test("dbscanCells: nprobe=2 recovers the boundary ε-pair nprobe=1 loses") {
    // centroids on axes 0 and 1; p2 = (1, 0.9, 0, 0) sits near the cell
    // boundary (cos to c0 ≈ 0.743 > cos to c1 ≈ 0.669, so its PRIMARY
    // cell is 0) while its ε-pair p3 = axis(1) lives in cell 1. At
    // nprobe=1 the pair straddles the boundary and is lost (p3 isolated
    // → noise); at nprobe=2 p2 also occupies its runner-up cell and the
    // pair is found — the multi-probe ε-recall contract, pinned.
    val cents = Seq((0L, axis(0)), (1L, axis(1))).toDF("cell", "cvec")
    val pts = Seq((1L, axis(0)), (2L, Array(1.0f, 0.9f, 0.0f, 0.0f)),
      (3L, axis(1))).toDF("id", "v")
    def run(np: Int) = Similarity.dbscanCells(pts, $"id", $"v",
        cents, $"cell", $"cvec", minCosine = 0.65, minPts = 2, nprobe = np)
      .orderBy("node").as[(Long, String, Option[Long], Long)].collect().toSeq
    assert(run(2) === Seq((1L, "core", Some(1L), 1L),
      (2L, "core", Some(1L), 2L), (3L, "core", Some(1L), 1L)))
    assert(run(1) === Seq((1L, "core", Some(1L), 1L),
      (2L, "core", Some(1L), 1L), (3L, "noise", None, 0L)))
  }

  // ——— audio ——————————————————————————————————————————————————————————

  test("FakePcmCodec: frame count rule and digest-derived samples") {
    val dec = Multimodal.FakePcmCodec.newDecoder()
    val small = "x".getBytes("UTF-8") // 1 byte → 1 frame
    assert(dec(small).length === 1)
    assert(dec(new Array[Byte](300)).length === 2) // 300/256 + 1
    assert(dec(new Array[Byte](2000)).length === 4) // capped at 4
    assert(dec(null).length === 0)
    // sample 0 of frame 0 = first two md5 bytes of (payload ++ "|0"),
    // big-endian signed
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest("x|0".getBytes("UTF-8"))
    val u = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
    val expected = if (u >= 32768) u - 65536 else u
    assert(dec(small)(0)(0) === expected)
  }

  test("WavPcmCodec: real WAV round-trips samples; corrupt payloads yield zero frames") {
    // encode 19 known samples (2 full frames + a 3-sample partial) as a
    // genuine RIFF/WAV via javax.sound.sampled, decode through the REAL
    // codec, and require sample-exact recovery
    val samples = Array.tabulate(19)(i => i * 1000 - 9000)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val dec = Multimodal.WavPcmCodec.newDecoder()
    val frames = dec(bos.toByteArray)
    assert(frames.map(_.length).toSeq === Seq(8, 8, 3))
    assert(frames.flatten.toSeq === samples.toSeq)
    // the AudioCodec contract: corrupt and null payloads never throw
    assert(dec("not a wav at all".getBytes("UTF-8")).isEmpty)
    assert(dec(null).isEmpty)
  }

  test("decodeAudio + frameEnergy: integer features match a hand fold") {
    val df = Seq((1L, "hello world")).toDF("doc_id", "text")
    val assets = Multimodal.fromText(df, "doc_id", "text", "doc_id",
      modality = "audio")
    val out = Multimodal.frameEnergy(Multimodal.decodeAudio(assets))
      .select("asset_id", "frame_idx", "energy", "peak")
      .as[(Long, Int, Long, Int)].collect()
    assert(out.length === 1) // 11 bytes → 1 frame
    val samples = Multimodal.FakePcmCodec.newDecoder()(
      "hello world".getBytes("UTF-8"))(0)
    assert(out(0)._3 === samples.map(s => math.abs(s).toLong).sum)
    assert(out(0)._4 === samples.map(math.abs).max)
  }

  // ——— ewmaStream —————————————————————————————————————————————————————

  private def ts(s: String) = Timestamp.valueOf(s)

  test("ewmaStream equals the batch fold across a batch seam, and n_obs carries over") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val q = Streaming.ewmaStream(
        input.toDF().toDF("event_type", "ts"), taps = 3)
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory").queryName("ewma_stream").start()
    val batch1 = Seq(
      ("a", ts("2024-01-01 10:00:00")), ("a", ts("2024-01-01 11:00:00")),
      ("a", ts("2024-01-02 10:00:00")), ("b", ts("2024-01-01 09:00:00")))
    val batch2 = Seq(
      ("a", ts("2024-01-03 10:00:00")), ("a", ts("2024-01-03 11:00:00")),
      ("a", ts("2024-01-03 12:00:00")), ("b", ts("2024-01-04 10:00:00")))
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ewma_stream")
      .select($"key", $"day", $"cnt", $"n_obs",
        graft.Readout.rd($"ewma_raw", 6).as("ewma"))
      .as[(String, String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val batch = Timeseries.ewmaDailyCounts(
        (batch1 ++ batch2).toDF("k", "ts"), $"k", $"ts", taps = 3)
      .select($"key", date_format($"day", "yyyy-MM-dd"), $"cnt", $"n_obs",
        $"ewma")
      .as[(String, String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(streamed.toSeq === batch.toSeq)
    // day 3 of key a leaned on state (days 1-2 arrived in batch 1)
    assert(streamed.count(_._1 == "a") === 3)
  }

  test("ewmaStream throws on a non-day-monotone batch seam") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val q = Streaming.ewmaStream(
        input.toDF().toDF("event_type", "ts"), taps = 3)
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory").queryName("ewma_stream_bad").start()
    try {
      input.addData(("a", ts("2024-01-05 10:00:00")))
      q.processAllAvailable()
      input.addData(("a", ts("2024-01-05 11:00:00"))) // same day again
      val err = intercept[Throwable] { q.processAllAvailable() }
      val msgs = Iterator.iterate[Throwable](err)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString("\n")
      assert(msgs.contains("day-monotone"), s"unexpected failure: $msgs")
    } finally q.stop()
  }
}
