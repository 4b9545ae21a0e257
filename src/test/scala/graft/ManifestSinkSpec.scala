package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The manifest sink's transactional contract: visibility = manifest
  * membership. Committed appends accumulate; orphan data files (failed
  * attempts, crashed jobs) are invisible; a failed job publishes nothing;
  * streaming epochs republish idempotently so a replayed stream converges
  * to the same table contents.
  */
class ManifestSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def write(dir: String, vals: Seq[String]): Unit =
    vals.toDF("value").write.format("graft-manifest")
      .option("path", dir).mode("append").save()

  private def readBack(dir: String): Set[String] =
    spark.read.format("graft-manifest").option("path", dir)
      .load().as[String].collect().toSet

  test("append commits accumulate; only the value column is accepted") {
    val dir = TestSpark.tmpDir("graft-man") + "/t"
    write(dir, Seq("a", "b"))
    write(dir, Seq("c"))
    assert(readBack(dir) === Set("a", "b", "c"))
    // the analyzer enforces the declared value-only schema up front
    val err = intercept[Exception] {
      Seq((1, "x")).toDF("k", "value").write.format("graft-manifest")
        .option("path", dir).mode("append").save()
    }
    assert(err.getMessage.contains("TOO_MANY_DATA_COLUMNS"))
  }

  test("orphan data files are invisible (visibility = manifest membership)") {
    val dir = TestSpark.tmpDir("graft-man") + "/t"
    write(dir, Seq("kept"))
    Files.write(Paths.get(s"$dir/data/part-stray-orphan.txt"),
      "phantom\n".getBytes)
    assert(readBack(dir) === Set("kept"))
  }

  test("a failing job publishes no manifest — reader state is unchanged") {
    val dir = TestSpark.tmpDir("graft-man") + "/t"
    write(dir, Seq("before"))
    val boom = udf((s: String) =>
      if (s == "v3") throw new RuntimeException("boom") else s)
    intercept[Exception] {
      (1 to 5).map(i => s"v$i").toDF("value")
        .select(boom($"value").as("value"))
        .write.format("graft-manifest").option("path", dir)
        .mode("append").save()
    }
    assert(readBack(dir) === Set("before"),
      "partial output from the failed job leaked into the manifest set")
  }

  test("publish reaps stale orphan .tmp manifests, never fresh ones") {
    val dir = TestSpark.tmpDir("graft-man") + "/t"
    write(dir, Seq("a"))
    val mdir = Paths.get(s"$dir/manifests")
    val stale = mdir.resolve(".dead.123.tmp")
    val fresh = mdir.resolve(".live.456.tmp")
    Files.write(stale, "orphan\n".getBytes)
    Files.write(fresh, "inflight\n".getBytes)
    // age the stale one past the reap horizon (1 h)
    Files.setLastModifiedTime(stale, java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis() - 2L * 60 * 60 * 1000))
    write(dir, Seq("b"))
    assert(!Files.exists(stale), "stale orphan .tmp must be reaped on publish")
    assert(Files.exists(fresh), "a fresh in-flight .tmp must survive")
    assert(readBack(dir) === Set("a", "b"))
  }

  test("V2 end to end: docgen stream lands through the manifest sink intact") {
    // both custom connectors in one pipeline: the generator streams
    // micro-batches, the sink commits one epoch manifest per batch, and
    // the landed table must equal the batch-read corpus exactly
    val dir = TestSpark.tmpDir("graft-v2e2e") + "/t"
    val q = spark.readStream.format("graft-docgen")
      .option("rows", 1200).option("rowsPerBatch", 500).load()
      .select(concat_ws("|", $"doc_id", $"lang", $"source").as("value"))
      .writeStream.format("graft-manifest").option("path", dir)
      .option("checkpointLocation", TestSpark.tmpDir("graft-v2e2e-ck"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val landed = readBack(dir)
    val expected = spark.read.format("graft-docgen").option("rows", 1200).load()
      .select(concat_ws("|", $"doc_id", $"lang", $"source").as("v"))
      .as[String].collect().toSet
    assert(landed === expected)
  }

  test("streaming epochs republish idempotently: full replay converges") {
    val dir = TestSpark.tmpDir("graft-man") + "/t"
    val src = TestSpark.tmpDir("graft-man-src")
    (1 to 100).map(i => s"ev$i").toDF("value")
      .coalesce(1).write.mode("overwrite").parquet(src)
    def land(ck: String): Unit = {
      val q = spark.readStream.schema("value STRING").parquet(src)
        .writeStream.format("graft-manifest").option("path", dir)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    land(TestSpark.tmpDir("graft-man-ck0"))
    // fresh checkpoint = worst-case full redelivery; epoch manifests are
    // overwritten in place, so contents converge instead of doubling
    land(TestSpark.tmpDir("graft-man-ck1"))
    val got = readBack(dir)
    assert(got.size === 100 && got("ev1") && got("ev100"))
  }

  test("snapshot reads pin a version: later commits stay invisible, typos throw") {
    val dir = TestSpark.tmpDir("graft-man") + "/t"
    write(dir, Seq("a", "b"))
    val v1 = graft.sources.Manifest.manifestNames(dir)
    assert(v1.size === 1)
    write(dir, Seq("c"))
    // pinned read = version 1; unpinned read = everything
    val pinned = spark.read.format("graft-manifest").option("path", dir)
      .option("snapshot", v1.mkString(",")).load().as[String].collect().toSet
    assert(pinned === Set("a", "b"))
    assert(readBack(dir) === Set("a", "b", "c"))
    // the snapshot stays readable as MORE commits land (append-only data)
    write(dir, Seq("d"))
    val again = spark.read.format("graft-manifest").option("path", dir)
      .option("snapshot", v1.mkString(",")).load().as[String].collect().toSet
    assert(again === Set("a", "b"))
    // a typo'd snapshot name must throw, not read as empty
    val err = intercept[Throwable] {
      spark.read.format("graft-manifest").option("path", dir)
        .option("snapshot", "no-such-manifest").load().collect()
    }
    val msgs = Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("snapshot names not found"))
  }
}
