package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew
import graft.sinks.Sinks

/** Scale-path operators: salting and bucketing. Correctness is checked
  * against the unsalted/unbucketed forms; the bucketing test additionally
  * asserts the exchange-free physical plan (the point of bucketing).
  */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 10k rows, key 1 is hot (~50% of all rows)
  private lazy val skewed = (1 to 10000).map { i =>
    val k = if (i % 2 == 0) 1L else (i % 97).toLong
    (i.toLong, k, i * 0.5)
  }.toDF("id", "k", "v")

  private lazy val dim = (0L to 99L).map(k => (k, s"name_$k")).toDF("dk", "dname")

  test("saltedAgg equals the direct aggregation") {
    val direct = skewed.groupBy($"k")
      .agg(count(lit(1)).as("n"),
        sum($"v".cast("decimal(18,2)")).cast("double").as("sv"))
      .as[(Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val salted = Skew.saltedAgg(skewed, Seq($"k"), Skew.saltOf($"id", 16),
      Seq(count(lit(1)).as("pn"),
        sum($"v".cast("decimal(18,2)")).as("pv")),
      Seq(sum($"pn").as("n"), sum($"pv").cast("double").as("sv")))
      .as[(Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(salted === direct)
  }

  test("saltedJoin equals the direct join") {
    val direct = skewed.join(dim, $"k" === $"dk")
      .select("id", "dname").as[(Long, String)].collect().toSet
    val salted = Skew.saltedJoin(skewed, $"k", Skew.saltOf($"id", 16),
      dim, $"dk", buckets = 16)
      .select("id", "dname").as[(Long, String)].collect().toSet
    assert(salted === direct)
    assert(salted.size === skewed.count()) // every fact matched exactly once
  }

  test("ORC and JSON-lines sinks round-trip with pushdown-capable scans") {
    val df = (1 to 500).map(i => (i.toLong, s"v$i", i * 1.5)).toDF("id", "s", "v")
    val dir = TestSpark.tmpDir("graft-fmt")
    Sinks.orc(df, s"$dir/orc")
    Sinks.jsonLines(df, s"$dir/json")
    val orcBack = spark.read.orc(s"$dir/orc")
    val jsonBack = spark.read.schema(df.schema).json(s"$dir/json")
    assert(orcBack.count() === 500 && jsonBack.count() === 500)
    assert(orcBack.filter($"id" === 42L).select("s").as[String].head() === "v42")
    // ORC scans take pushed filters like parquet
    val p = orcBack.filter($"id" > 400).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters"), p)
  }

  test("approximate aggregates stay within tolerance of exact (the 100 TB default)") {
    // at scale, count_distinct/percentile become HLL/t-digest sketches:
    // single-pass, mergeable, bounded memory. Pin their error envelope.
    val df = (1 to 20000).map(i => (i.toLong % 4, (i % 1777).toLong, i * 0.5))
      .toDF("g", "u", "v")
    val rows = df.groupBy($"g").agg(
      countDistinct($"u").as("exact_d"),
      approx_count_distinct($"u", 0.02).as("approx_d"),
      expr("percentile(v, 0.5)").as("exact_p50"),
      percentile_approx($"v", lit(0.5), lit(5000)).as("approx_p50"))
      .collect()
    rows.foreach { r =>
      val (ed, ad) = (r.getAs[Long]("exact_d"), r.getAs[Long]("approx_d"))
      assert(math.abs(ad - ed).toDouble / ed < 0.05, s"HLL off: $ed vs $ad")
      val (ep, ap) = (r.getAs[Double]("exact_p50"), r.getAs[Double]("approx_p50"))
      assert(math.abs(ap - ep) / math.max(1.0, ep) < 0.02,
        s"t-digest off: $ep vs $ap")
    }
  }

  test("AQE splits a skewed join partition at runtime (the un-salted path)") {
    // one key carries ~50% of the fact side; with test-scale skew
    // thresholds AQE must mark the sort-merge join skew-handled and split
    // the hot partition — the mechanism the LSH/banded joins lean on when
    // a bucket goes hot and deterministic salting isn't already applied
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = (1 to 200000).map { i =>
        val k = if (i % 2 == 0) 1L else (i % 97).toLong
        (k, "payload-" * 8 + i)
      }.toDF("k", "pay")
      val j = fact.join(dim, $"k" === $"dk").groupBy($"dname")
        .agg(count(lit(1)).as("n"))
      // collect() executes j's own adaptive plan, so the SAME plan object
      // below reports its final (re-optimized) form
      assert(j.collect().length === 97) // keys 0..96 all occur; 1 is hot
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the join skew-handled:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("count-min sketch heavy-hitter estimates stay within the eps envelope") {
    // the sketch is the shuffle-free heavy-hitters path at 100 TB: partials
    // merge associatively inside one aggregation; only the fixed-size
    // sketch ever reaches the driver
    val df = (1 to 50000).map { i =>
      val tok = if (i % 3 == 0) "hot" else s"t${i % 500}"
      Tuple1(tok)
    }.toDF("tok")
    val eps = 0.001 // estimate error <= eps * N with prob >= confidence
    val bytes = df.agg(
      expr(s"count_min_sketch(tok, CAST($eps AS DOUBLE), CAST(0.99 AS DOUBLE), 42)"))
      .head().getAs[Array[Byte]](0)
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val exact = df.groupBy($"tok").count().as[(String, Long)].collect().toMap
    val n = 50000L
    exact.foreach { case (tok, c) =>
      val est = sketch.estimateCount(tok)
      assert(est >= c, s"CMS underestimated $tok: $est < $c") // never under
      assert(est <= c + (eps * n).toLong + 1,
        s"CMS over eps envelope for $tok: est=$est exact=$c")
    }
  }

  test("joins over co-bucketed tables plan without a shuffle exchange") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    Sinks.writeBucketed(a, "buck_a", Seq("k"), 8, Seq("k"))
    Sinks.writeBucketed(b, "buck_b", Seq("k"), 8, Seq("k"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("buck_a").join(spark.table("buck_b"), "k")
      assert(j.count() === 1000)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS buck_a")
      spark.sql("DROP TABLE IF EXISTS buck_b")
    }
  }
}
