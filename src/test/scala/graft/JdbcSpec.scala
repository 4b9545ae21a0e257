package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Ingest
import graft.sinks.Sinks

/** Real JDBC round-trips against embedded Derby (ships with Spark): the
  * reference's Postgres-coupled paths — append sink, replace sink,
  * delete+insert idempotency, distinct-key pushdown read — exercised
  * against an actual database rather than mocked.
  */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val url = {
    val dir = TestSpark.tmpDir("derby")
    s"jdbc:derby:$dir/db;create=true"
  }

  private def batch = Seq(
    ("botucatu", 2024L, 1L, 10.5),
    ("são paulo", 2024L, 1L, 20.0),
    ("campinas", 2024L, 2L, 30.0))
    .toDF("municipio", "ano_ref", "mes_ref", "valor")

  test("K1/K3: JDBC append creates the table with custom column DDL") {
    val df = batch
    df.write.mode("append")
      .option("createTableColumnTypes",
        "municipio VARCHAR(150), ano_ref BIGINT, mes_ref BIGINT, valor DOUBLE")
      .jdbc(url, "municipios", new java.util.Properties())
    val back = spark.read.jdbc(url, "municipios", new java.util.Properties())
    assert(back.count() === 3)
    assert(back.columns.map(_.toLowerCase).toSet ===
      Set("municipio", "ano_ref", "mes_ref", "valor"))
  }

  test("S6: distinct-key query pushes down to the database") {
    // Spark's JDBC writer quotes column names, so Derby stores them
    // case-sensitively — raw SQL must quote them back
    val keys = Ingest.jdbcQuery(spark, url,
      """SELECT DISTINCT "municipio", "ano_ref", "mes_ref" FROM municipios""")
    assert(keys.count() === 3)
    assert(keys.columns.length === 3)
  }

  test("K4: delete+insert re-run is idempotent for the scoped partition") {
    // re-load january 2024 with changed values: delete the month, re-append
    val jan = batch.filter($"mes_ref" === 1L)
      .withColumn("valor", $"valor" * 2)
    Sinks.jdbcDeleteInsert(jan, url, "municipios",
      """"ano_ref" = 2024 AND "mes_ref" = 1""")
    val after = spark.read.jdbc(url, "municipios", new java.util.Properties())
    assert(after.count() === 3) // 2 replaced + 1 untouched february row
    assert(after.filter($"mes_ref" === 1L).count() === 2)
    // re-running the same delete+insert changes nothing
    Sinks.jdbcDeleteInsert(jan, url, "municipios",
      """"ano_ref" = 2024 AND "mes_ref" = 1""")
    assert(spark.read.jdbc(url, "municipios", new java.util.Properties())
      .count() === 3)
  }

  test("K2: JDBC replace truncates and reloads") {
    val tiny = Seq(("x", 1L, 1L, 1.0)).toDF("municipio", "ano_ref", "mes_ref", "valor")
    Sinks.jdbcReplace(tiny, url, "municipios")
    assert(spark.read.jdbc(url, "municipios", new java.util.Properties())
      .count() === 1)
  }
}
