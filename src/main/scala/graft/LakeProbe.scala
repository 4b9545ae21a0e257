package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Lake file-skipping scale probe (round-12 verdict directive #1): land
  * the documents table as a key-clustered lake table at two scale
  * factors and plan the SAME fixed-selectivity predicate over both —
  * the pin is that SELECTED bytes track the selected row fraction while
  * TABLE bytes grow with the corpus: at 10× the data, a fixed id-range
  * predicate should read ≈ the same bytes (the matching files only),
  * i.e. `selected_bytes_ratio ≪ table_bytes_ratio ≈ 10`. Also
  * cross-checks the pruned read's row count against the unpruned
  * read + filter (the inclusive-pruning law at probe scale).
  *
  * Prints one JSON line; driver-side tooling saves it as
  * bench_out/scale_r12_lake.json.
  */
object LakeProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows = dirs.map { dir =>
      val stage = java.nio.file.Files.createTempDirectory("graft_lakeprobe")
      val table = s"$stage/t"
      // lineitem = the big fact: 10× rows across the two SFs, clustered
      // on the key the predicate selects; the FIXED orderkey range
      // matches ≈ the same rows at both SFs (row density per orderkey
      // is constant — the corpus grows by ADDING orderkeys)
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      // CONSTANT rows-per-file grain (a real table keeps file SIZE fixed
      // and grows file COUNT with the corpus — 16 files at every SF
      // would instead coarsen the grain 10× and mask the skipping)
      val nFiles = math.max(4, (li.count() / 4000L).toInt)
      graft.sources.Lake.land(spark, table,
        li.repartitionByRange(nFiles, col("l_orderkey")), "gen-1")
      val pred = col("l_orderkey") >= 1000L && col("l_orderkey") < 2000L
      val (sel, skipped) =
        graft.sources.Lake.planFiles(table, None, Some(pred))
      def bytes(fs: Seq[String]): Long = fs.map { p =>
        graft.sources.Manifest.fs(table)
          .getFileStatus(new org.apache.hadoop.fs.Path(p)).getLen
      }.sum
      val prunedRows = graft.sources.Lake
        .read(spark, table, None, Some(pred)).count()
      val fullRows = graft.sources.Lake
        .read(spark, table).filter(pred).count()
      require(prunedRows == fullRows,
        s"pruned read diverged: $prunedRows vs $fullRows")
      val r = Map(
        "dir" -> s""""$dir"""",
        "table_files" -> (sel.size + skipped.size).toString,
        "selected_files" -> sel.size.toString,
        "table_bytes" -> (bytes(sel) + bytes(skipped)).toString,
        "selected_bytes" -> bytes(sel).toString,
        "selected_rows" -> prunedRows.toString)
      graft.sources.Manifest.fs(table)
        .delete(new org.apache.hadoop.fs.Path(stage.toString), true)
      r
    }
    val body = rows.map(r => "{" +
      r.map { case (k, v) => s""""$k":$v""" }.mkString(",") + "}")
      .mkString("[", ",", "]")
    val tb = rows.map(_("table_bytes").toDouble)
    val sb = rows.map(_("selected_bytes").toDouble)
    val line = s"""{"metric":"lake_selected_fraction","sfs":$body,""" +
      s""""table_bytes_ratio":${tb.last / tb.head},""" +
      s""""selected_bytes_ratio":${sb.last / sb.head}}"""
    println(line)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { out =>
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (line + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
