package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Harness probe for the Bradley–Terry scale shape (kept, like
  * BpeProbe, as a real utility: the q286 rows in BASELINE.md come from
  * it): times the full fit over q286's md5 duel log with and without
  * the shuffle-hash score-join pin. Set SPARK_GRAFT_BT_DEBUG=1 for
  * per-stage timings inside the fit — the instrumentation that caught
  * the round-8 filter-pushdown re-inlining bug (a pre-checkpoint
  * filter let Catalyst inline the md5 duel derivation ~6× per row:
  * 66 s vs 12 s at sf0.1).
  * Usage: runMain graft.BtProbe <sfDir> [iters]
  */
object BtProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def h(salt: String, pid: org.apache.spark.sql.Column,
          k: org.apache.spark.sql.Column) =
      pmod(conv(substring(md5(concat(lit(salt), lit("|"), pid, lit("|"),
        k.cast("string")).cast("binary")), 1, 8), 16, 10).cast("long"),
        lit(20000L))
    val duels = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string")).as("pid"))
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("pid"), explode(sequence(lit(0), lit(3))).as("k"))
      .select(h("bta", col("pid"), col("k")).as("ia"),
        h("btb", col("pid"), col("k")).as("ib"))
      .filter(col("ia") =!= col("ib"))
    val qa = col("ia") % 997
    val qb = col("ib") % 997
    val pairs = duels.select(
      concat(lit("i"), when(qa > qb, col("ia")).when(qb > qa, col("ib"))
        .otherwise(least(col("ia"), col("ib"))).cast("string")).as("winner"),
      concat(lit("i"), when(qa > qb, col("ib")).when(qb > qa, col("ia"))
        .otherwise(greatest(col("ia"), col("ib"))).cast("string")).as("loser"))
    for (hint <- Seq("", "shuffle_hash"); r <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.ops.Train.bradleyTerryScores(pairs, col("winner"),
        col("loser"), iters = iters, rate = 0.5, scoreJoinHint = hint)
        .count()
      println(f"[btprobe] hint='$hint' run$r items=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
  }
}
