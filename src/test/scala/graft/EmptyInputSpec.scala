package graft

import org.scalatest.funsuite.AnyFunSuite

/** Edge-case robustness: every declared query must PLAN and EXECUTE on
  * schema-matched EMPTY tables (zero-row parquet) without throwing —
  * the empty-partition / empty-delta case every 100 TB pipeline hits
  * (dags/etl_municipios.py:152-154 early-exits on it; our operators must
  * simply produce empty results).
  *
  * Streaming queries are excluded: an empty memory-sink table is a
  * different harness concern (covered by StreamingSpec's bounded runs).
  */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emptyDir: String = {
    val dir = TestSpark.tmpDir("graft-empty")
    Tables.names.foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .limit(0).write.mode("overwrite")
        .parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private val streaming = Set("q36_stream_window_agg", "q45_stream_distinct_types",
    "q70_stream_range_join", "q89_stream_landing")

  test("every batch query returns an empty (or constant-size) result on empty input") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if streaming(name) => None
      case (name, q) =>
        try {
          q(spark, emptyDir).count(); None
        } catch {
          case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
