package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway-style harness probe for the incremental BPE trainer's
  * per-round cost (kept, like Smoke/QDebug, as a real utility: the 10×
  * scale table for q282 is produced with it).
  * Usage: runMain graft.BpeProbe <sfDir> <iters> [compactEvery]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    val compactEvery = if (args.length > 2) args(2).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val words = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(substring(md5(col("o_orderkey").cast("string")
        .cast("binary")), 1, 8).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    for (it <- Seq(math.min(16, iters), iters).distinct) {
      val t0 = System.nanoTime()
      val n = graft.ops.Bpe.bpeMerges(words, col("word"), col("cnt"),
        iters = it, compactEvery = compactEvery).count()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[bpeprobe] sf=$sfDir iters=$it merges=$n wall=$w%.1f s (${w / it}%.2f s/round)")
    }
  }
}
