package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks

class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("withAuditColumns appends unique id + load timestamp") {
    val df = Sinks.withAuditColumns(Seq("a", "b").toDF("v"))
    assert(df.columns.toSeq === Seq("v", "id", "data_carga"))
    assert(df.select("id").distinct().count() === 2)
  }

  test("versionedCsv keeps at most `keep` versions, newest retained") {
    val dir = TestSpark.tmpDir("versioned")
    val df = Seq(("a", 1)).toDF("k", "v")
    val written = (1 to 4).map { _ =>
      Thread.sleep(1100) // distinct yyyyMMdd_HHmmss stamps
      Sinks.versionedCsv(df, dir, keep = 3)
    }
    val kept = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("analise_")).map(_.getName).sorted
    assert(kept.length === 3)
    assert(kept.last === written.last.split("/").last) // newest survived
    // content round-trips with the `;` separator
    val back = spark.read.option("sep", ";").option("header", "true")
      .csv(written.last)
    assert(back.columns.toSeq === Seq("k", "v"))
    assert(back.count() === 1)
  }

  test("lakeAppend partitions by the reference-period keys") {
    val dir = TestSpark.tmpDir("lake") + "/t"
    val df = Seq(("a", 2024L, 1L), ("b", 2024L, 2L)).toDF("m", "ano_ref", "mes_ref")
    Sinks.lakeAppend(df, dir)
    val parts = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("ano_ref="))
    assert(parts.nonEmpty) // physical layout is partitioned -> pruning works
    assert(spark.read.parquet(dir).count() === 2)
  }
}
