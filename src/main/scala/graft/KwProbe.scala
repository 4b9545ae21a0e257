package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** List-size scaling probe for the Aho–Corasick
  * [[graft.functions.KeywordCounts]] expression — the claim under test
  * is the whole point of the automaton: scan cost is (near-)independent
  * of keyword-list size, where the compositional regexp_count twin pays
  * one text pass PER keyword. Times `keywordCounts` over the documents
  * corpus at several list sizes (synthetic distinct keywords derived
  * from md5 hex so none trivially match), plus the compositional twin
  * at the smallest and a mid size as the contrast. Numbers land in
  * BASELINE.md like BpeProbe's.
  *
  * Usage: runMain graft.KwProbe <sfDir>
  */
object KwProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(lower(col("text")).as("t"))
      .repartition(cpus.toInt).cache()
    docs.count() // materialize once, off the clock

    // synthetic keywords: md5-hex fragments (rarely present) + a few
    // real corpus words so the match path is exercised too
    def kws(n: Int): Seq[String] =
      Seq("scan", "window", "order", "batch batch") ++
        (0 until (n - 4)).map(i =>
          java.security.MessageDigest.getInstance("MD5")
            .digest(s"kw$i".getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.substring(0, 8))

    def time(label: String, c: org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      val s = docs.select(aggregate(c, lit(0L), (a, x) => a + x).as("h"))
        .agg(sum(col("h"))).head().getLong(0)
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[kwprobe] sf=$sfDir $label wall=$w%.2f s (hits=$s)")
    }

    for (n <- Seq(8, 64, 512, 4096)) {
      val list = kws(n)
      time(f"automaton k=$n%4d", graft.functions.keywordCounts(col("t"), list))
      if (n <= 512)
        time(f"regexp    k=$n%4d",
          graft.functions.keywordCountsCompositional(col("t"), list))
    }
  }
}
