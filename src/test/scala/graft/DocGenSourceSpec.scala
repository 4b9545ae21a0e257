package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The V2 docgen connector's contract: deterministic content, planned
  * parallelism, column pruning (unprojected columns never synthesized),
  * and doc_id filter pushdown that SKIPS input partitions at planning
  * time — the scale behaviors, pinned at test size.
  */
class DocGenSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gen(rows: Int, parts: Int = 8) =
    spark.read.format("graft-docgen")
      .option("rows", rows).option("partitions", parts).load()

  test("generates `rows` rows across `partitions` planned slices, deterministically") {
    val df = gen(1000, parts = 7)
    assert(df.count() === 1000)
    assert(df.rdd.getNumPartitions === 7)
    assert(df.select(countDistinct($"doc_id")).as[Long].head() === 1000)
    // same options -> bit-identical corpus (pure function of doc_id)
    assert(gen(1000, parts = 3).orderBy("doc_id").collect()
      === df.orderBy("doc_id").collect())
    // schema matches the documents table's shape
    assert(df.columns.toSeq ===
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    val r = df.filter($"doc_id" === 42L).head()
    assert(r.getAs[Long]("n_chars") === r.getAs[String]("text").length.toLong)
  }

  test("column pruning reaches the scan: unprojected columns are not generated") {
    val scan = gen(100).select("doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"scan did not prune to the projection:\n$scan")
    assert(!scan.contains("text"), s"text survived pruning:\n$scan")
  }

  test("doc_id range filters push down and skip whole input partitions") {
    // 1000 rows in 10 slices of 100; doc_id < 250 must plan only 3 slices
    val df = gen(1000, parts = 10).filter($"doc_id" < 250)
    assert(df.rdd.getNumPartitions === 3, "out-of-range slices not skipped")
    assert(df.count() === 250)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [LessThan(doc_id,250)]"),
      s"filter not pushed:\n$plan")
    // equality prunes to a single one-row slice
    val one = gen(1000, parts = 10).filter($"doc_id" === 777L)
    assert(one.rdd.getNumPartitions === 1)
    assert(one.as[(Long, String, String, String, Long)].head()._1 === 777L)
    // non-doc_id predicates are residual, still evaluated correctly
    val res = gen(1000).filter($"lang" === "en")
    assert(res.count() > 0 && res.count() < 1000)
  }

  test("streams the same corpus in rowsPerBatch micro-batches, exactly once") {
    val q = spark.readStream.format("graft-docgen")
      .option("rows", 2500).option("partitions", 4)
      .option("rowsPerBatch", 1000).load()
      .writeStream.format("memory").queryName("docgen_stream")
      .option("checkpointLocation", TestSpark.tmpDir("graft-dgck"))
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("docgen_stream")
      assert(streamed.count() === 2500)
      assert(streamed.select(countDistinct($"doc_id")).as[Long].head() === 2500)
      assert(q.recentProgress.count(_.numInputRows > 0) === 3,
        "expected 3 non-empty micro-batches of <=1000 rows")
      // the stream delivers the identical corpus the batch read generates
      assert(streamed.orderBy("doc_id").collect()
        === gen(2500).orderBy("doc_id").collect())
    } finally q.stop()
  }

  test("pushed range is the intersection of all doc_id predicates") {
    val df = gen(1000, parts = 10)
      .filter($"doc_id" >= 120 && $"doc_id" <= 180)
    assert(df.count() === 61)
    assert(df.rdd.getNumPartitions === 1) // both bounds land in slice [100,200)
    assert(df.agg(min("doc_id"), max("doc_id")).as[(Long, Long)].head()
      === ((120L, 180L)))
  }

  test("user-supplied schema: exact match accepted, mismatch fails fast") {
    import org.apache.spark.sql.types._
    val inferred = spark.read.format("graft-docgen")
      .option("rows", 1).load().schema
    val ok = spark.read.format("graft-docgen")
      .schema(inferred)
      .option("rows", 10).load()
    assert(ok.count() === 10)
    val bad = intercept[Exception] {
      spark.read.format("graft-docgen")
        .schema(StructType(Seq(StructField("nope", LongType))))
        .option("rows", 10).load().count()
    }
    assert(bad.getMessage.contains("does not match"),
      s"expected the schema-mismatch message, got: ${bad.getMessage}")
  }
}
