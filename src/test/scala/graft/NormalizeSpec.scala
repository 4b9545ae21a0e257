package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.normalize.Normalize

class NormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("renamePresent renames only columns that exist") {
    val df = Seq(("Botucatu", 2)).toDF("Município", "Admitidos")
    val out = Normalize.renamePresent(df,
      Map("Município" -> "municipio", "Desligados" -> "desligados",
        "Admitidos" -> "admitidos"))
    assert(out.columns.toSeq === Seq("municipio", "admitidos"))
  }

  test("allowlist keeps intersection in allowlist order") {
    val df = Seq((1, "x", 2.0)).toDF("b", "a", "z")
    val out = Normalize.allowlist(df, Seq("a", "b", "missing"))
    assert(out.columns.toSeq === Seq("a", "b"))
  }

  test("conform coerces, fills defaults, and materializes missing columns") {
    val target = StructType(Seq(
      StructField("municipio", StringType),
      StructField("admitidos", LongType),
      StructField("tempo", DoubleType)))
    val df = Seq(("Botucatu", "12"), (null, "oops")).toDF("municipio", "admitidos")
    val rows = Normalize.conform(df, target).orderBy("municipio").collect()
    assert(rows(0).getString(0) === "Botucatu")
    assert(rows(0).getLong(1) === 12L)      // string "12" cast to long
    assert(rows(0).getDouble(2) === 0.0)    // missing column defaulted
    assert(rows(1).getString(0) === "Indefinido") // null string back-filled
    assert(rows(1).getLong(1) === 0L)       // uncastable -> null -> 0
  }

  test("coerceOrDefault is cast-or-null + default (Polars strict=False shape)") {
    val df = Seq("7", "x", null).toDF("v")
    val out = df.select(Normalize.coerceOrDefault($"v", "long", lit(0L)).as("v"))
      .as[Long].collect().sorted
    assert(out.toSeq === Seq(0L, 0L, 7L))
  }

  test("withReferencePeriod stamps ano/mes/data_competencia literals") {
    val out = Normalize.withReferencePeriod(Seq(1).toDF("x"), 2025, 10).head()
    assert(out.getAs[Long]("ano_ref") === 2025L)
    assert(out.getAs[Long]("mes_ref") === 10L)
    assert(out.getAs[java.sql.Date]("data_competencia").toString === "2025-10-01")
  }

  test("columnOrPosition prefers the named column, else falls back by index") {
    val df = Seq(("a", "b", "c")).toDF("x", "COD", "z")
    assert(df.select(Normalize.columnOrPosition(df, "COD", 0)).head().getString(0) === "b")
    assert(df.select(Normalize.columnOrPosition(df, "NOME", 2)).head().getString(0) === "c")
  }
}
