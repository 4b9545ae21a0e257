package graft

import java.nio.file.{Files, Paths}

/** Usage example / manual smoke of the ingest surface: sanitizing JSON
  * reader on a fixture with quoted INF tokens, plus the delimiter-fallback
  * CSV reader. Run: `sbt "runMain graft.Demo"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    val dir = Files.createTempDirectory("graft-demo").toString
    Files.writeString(Paths.get(s"$dir/data.json"),
      """{ "DS0": [
        |  {"Município": "Botucatu", "Admitidos": 2, "Variação Relativa": "INF"},
        |  {"Município": "São Paulo", "Admitidos": null, "Variação Relativa": "-0.5"}
        |] }""".stripMargin)
    val df = ingest.Ingest.sanitizedJson(spark, s"$dir/data.json")
    df.show(truncate = false)
    println(s"[demo] json rows=${df.count()} cols=${df.columns.mkString(",")}")

    Files.writeString(Paths.get(s"$dir/dim.csv"), "UF,COD,NOME\nSP,3507506,Botucatu\n")
    val csv = ingest.Ingest.csvWithDelimiterFallback(spark, s"$dir/dim.csv")
    println(s"[demo] csv fallback cols=${csv.columns.mkString(",")}")

    // typed MinHash Aggregator over exploded shingle hashes
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.{shingleSet, MinHashSignatureAgg}
    val sigs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(100)
      .select($"doc_id", explode(shingleSet($"text")).as("sh"))
      .select($"doc_id", xxhash64($"sh").as("h")).as[(Long, Long)]
      .groupByKey(_._1)
      .agg(new MinHashSignatureAgg(16).toColumn.name("sig"))
    println(s"[demo] minhash signatures=${sigs.count()} width=" +
      sigs.head()._2.length)

    // full EP2 pipeline: sanitize → enrich → coerce → partition overwrite
    Files.writeString(Paths.get(s"$dir/ibge.csv"),
      "UF;COD;NOME\nSP;3507506;botucatu\nSP;3550308;são paulo\n")
    val lake = s"$dir/lake"
    val n = pipeline.MunicipioPipeline.runLocalLake(
      spark, s"$dir/data.json", Some(s"$dir/ibge.csv"), 2025, 10, lake)
    val n2 = pipeline.MunicipioPipeline.runLocalLake(
      spark, s"$dir/data.json", Some(s"$dir/ibge.csv"), 2025, 10, lake)
    println(s"[demo] EP2 lake rows first=$n rerun=$n2 " +
      s"total=${spark.read.parquet(lake).count()}")

    // hashed-shingle similarity join over the documents table
    val pairs = ops.Dedup.ngramJaccardPairs(
      Tables.load(spark, "/root/testdata/sf0.001", "documents"),
      $"doc_id", $"text", Seq($"lang", $"source"), hashedShingles = true)
      .filter($"jaccard" > 0)
    println(s"[demo] hashed jaccard pairs>0: ${pairs.count()}")
    spark.stop()
  }
}
