package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Dump `.explain("formatted")` for the round-14 touched queries into
  * plans/r14/<query>_<tag>.txt — one session for all dumps (the judge's
  * evidence files; regenerate with `runMain graft.R14Plans <tag> [sfDir]`,
  * tag = "before" on the pre-round commit, "after" on HEAD).
  */
object R14Plans {
  val touched: Seq[String] = Seq(
    "q276_bradley_terry", "q286_bradley_terry_scale",
    "q138_label_propagation", "q217_hits", "q227_bfs_distance",
    "q169_kcore",
    "q302_nb_predict", "q303_nb_confusion", "q328_model_lang_gate",
    "q338_charngram_lang_gate",
    "q234_ks_drift_stream", "q326_calibration_drift_stream",
    "q69_dedup_keep_best", "q145_canonical_by_priority",
    "q200_eval_report")

  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "after"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.local()
    Files.createDirectories(Paths.get("plans/r14"))
    touched.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.write(Paths.get(s"plans/r14/${name}_$tag.txt"),
          plan.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
          StandardOpenOption.WRITE)
        println(s"[r14plans] wrote $name $tag")
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"[r14plans] FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
