package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Ingest

class IngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def write(path: String, content: String): Unit =
    Files.writeString(Paths.get(path), content)

  test("sanitizedJson scrubs quoted INF/-INF/NaN and unwraps first-key records") {
    val dir = TestSpark.tmpDir("json")
    write(s"$dir/data.json",
      """{ "DS0": [
        |  {"Município": "Botucatu", "Admitidos": 2, "Variação": "INF"},
        |  {"Município": "São Paulo", "Admitidos": null, "Variação": "-INF"},
        |  {"Município": "Campinas", "Admitidos": 7, "Variação": "NaN"}
        |] }""".stripMargin)
    val df = Ingest.sanitizedJson(spark, s"$dir/data.json")
    assert(df.count() === 3)
    assert(df.columns.toSet === Set("Município", "Admitidos", "Variação"))
    // the scrubbed tokens must arrive as nulls, not strings
    assert(df.filter(df("Variação").isNotNull).count() === 0)
  }

  test("sanitizedJson accepts a bare top-level array") {
    val dir = TestSpark.tmpDir("json2")
    write(s"$dir/data.json", """[{"a": 1}, {"a": 2}]""")
    val df = Ingest.sanitizedJson(spark, s"$dir/data.json")
    assert(df.count() === 2)
  }

  test("csvWithDelimiterFallback retries with comma when `;` yields one column") {
    val dir = TestSpark.tmpDir("csv")
    write(s"$dir/semi.csv", "UF;COD;NOME\nSP;3507506;Botucatu\n")
    write(s"$dir/comma.csv", "UF,COD,NOME\nSP,3507506,Botucatu\n")
    assert(Ingest.csvWithDelimiterFallback(spark, s"$dir/semi.csv").columns.length === 3)
    assert(Ingest.csvWithDelimiterFallback(spark, s"$dir/comma.csv").columns.length === 3)
  }

  test("newestFile picks the most recently modified match") {
    val dir = TestSpark.tmpDir("newest")
    write(s"$dir/a.json", "{}")
    val f = Paths.get(s"$dir/b.json")
    write(f.toString, "{}")
    f.toFile.setLastModified(System.currentTimeMillis() + 60000)
    assert(Ingest.newestFile(spark, s"$dir/*.json").exists(_.endsWith("b.json")))
    assert(Ingest.newestFile(spark, s"$dir/*.csv").isEmpty)
  }

  test("orEmpty degrades to an empty frame with the given schema") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("municipio", StringType),
      StructField("ano_ref", LongType)))
    val df = Ingest.orEmpty(spark, schema) {
      spark.read.parquet("/nonexistent/path")
    }
    assert(df.count() === 0)
    assert(df.schema === schema)
  }
}
