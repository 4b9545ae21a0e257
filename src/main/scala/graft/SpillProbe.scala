package graft

import org.apache.spark.sql.SparkSession

/** Constrained-memory spill proof (round-12 verdict directive #6): run
  * the engine's largest shuffle — q169 k-core on the 100× disjoint-
  * component graph replica (tools/gen_scale_graph.py, ~22 GB shuffle)
  * — under a DELIBERATELY small heap and record that the engine SPILLS
  * AND COMPLETES instead of OOMing, with the same results: the replica
  * graph is 100 disjoint component-identical copies, so the big run's
  * row count must be exactly `replicas ×` the sf0.1 run's.
  *
  * Run via direct java with `-Xmx<small>` (the sbt-configured 16g
  * default would defeat the point):
  *   java <add-opens…> -Xmx8g -cp target/scala-2.13/classes:/opt/spark/jars/\*
  *     graft.SpillProbe /root/testdata/sf0.1 /tmp/sf10graph 100
  *
  * Degradation contract this measures: sort/agg/SMJ lanes spill to
  * disk when execution memory runs short. The default pair-join
  * profile pins shuffle_hash (whose build map is deliberately
  * in-memory — the fast path when sized like any production executor);
  * `SPARK_GRAFT_PAIR_HINT=merge` selects the spill-safe SMJ cluster
  * profile, which is the honest configuration for a memory-starved
  * executor and the one this probe records.
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val small = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val big = if (args.length > 1) args(1) else "/tmp/sf10graph"
    val replicas = if (args.length > 2) args(2).toLong else 100L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val query = sys.env.getOrElse("SPARK_GRAFT_SPILL_QUERY", "q169_kcore")
    // the spill-aware sizing discipline: at 100× data under a small
    // heap, shuffle partitions must be sized so one task's aggregation
    // state fits its memory share — cpus-many 1.4 GB partitions do not
    // (AGGREGATE_OUT_OF_MEMORY before the spill path can engage); AQE
    // coalesces the small ones back, so over-partitioning costs little
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_PAIR_HINT")
      .foreach(v => spark.conf.set(GraftConf.PairJoinHintKey, v))
    val metrics = new TaskMetricsListener
    spark.sparkContext.addSparkListener(metrics)
    val fn = SparkEntry.queries(query)

    def run(dir: String): (Long, Double, Bench.QueryMetrics) = {
      metrics.reset()
      val t0 = System.nanoTime()
      val rows = fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      (rows, sec, metrics.snapshot)
    }

    val (smallRows, smallSec, smallM) = run(small)
    val (bigRows, bigSec, bigM) = run(big)
    val resultsMatch = bigRows == replicas * smallRows
    val line =
      s"""{"metric":"spill_proof","query":"$query","heap_mb":${
        Runtime.getRuntime.maxMemory() / (1024 * 1024)},"cpus":$cpus,""" +
      s""""shuffle_partitions":$shufflePartitions,""" +
      s""""pair_hint":"${GraftConf.pairJoinHint(spark)}",""" +
      s""""memory_fraction":"${spark.sparkContext.getConf
        .get("spark.memory.fraction", "default")}",""" +
      s""""small":{"dir":"$small","rows":$smallRows,"sec":$smallSec,""" +
      s""""spill":${smallM.spill},"shuffle_rd":${smallM.shuffleRd}},""" +
      s""""big":{"dir":"$big","rows":$bigRows,"sec":$bigSec,""" +
      s""""spill":${bigM.spill},"shuffle_rd":${bigM.shuffleRd}},""" +
      s""""replicas":$replicas,"results_match":$resultsMatch,""" +
      s""""completed":true}"""
    println(line)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { out =>
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (line + "\n").getBytes("UTF-8"))
    }
    require(resultsMatch,
      s"big rows $bigRows != $replicas x small rows $smallRows")
    spark.stop()
  }
}
