package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Normalization (SURVEY.md §2.3 P1-P7 + §2.7 F1-F12): schema wrangling of
  * messy extractor output into a fixed target schema.
  *
  * The reference does this defensively and eagerly (conditional renames,
  * cast-or-null, fill-null, allowlist projection — pipeline.py:64-141,
  * 178-186). Here every step is a lazy Column expression so the whole
  * normalize chain collapses into one Catalyst projection over the scan.
  */
object Normalize {

  /** The fixed target schema of the reference's municipality fact table
    * (pipeline.py:148-171 DDL → Spark types per SURVEY.md §1.3).
    */
  val municipioSchema: StructType = StructType(Seq(
    StructField("municipio", StringType),
    StructField("codigo_ibge", LongType),
    StructField("grande_grupamento_atividade", StringType),
    StructField("atividade_economica", StringType),
    StructField("cnae_secao", StringType),
    StructField("cnae_divisao", StringType),
    StructField("cnae_grupo", StringType),
    StructField("cnae_classe", StringType),
    StructField("cnae_subclasse", StringType),
    StructField("admitidos", LongType),
    StructField("desligados", LongType),
    StructField("saldo", LongType),
    StructField("estoque", LongType),
    StructField("variacao_relativa", DoubleType),
    StructField("tempo_emprego", DoubleType),
    StructField("ano_ref", LongType),
    StructField("mes_ref", LongType),
    StructField("data_competencia", DateType)))

  /** P3 rename map (pipeline.py:68-85): Portuguese headers → snake_case. */
  val renameMap: Map[String, String] = Map(
    "Geográfico.Município" -> "municipio",
    "Município" -> "municipio",
    "Grande Grupamento Atividade Econômica" -> "grande_grupamento_atividade",
    "Atividade Econômica" -> "atividade_economica",
    "CNAE 2.0 Seção" -> "cnae_secao",
    "CNAE 2.0 Divisão" -> "cnae_divisao",
    "CNAE 2.0 Grupo" -> "cnae_grupo",
    "CNAE 2.0 Classe" -> "cnae_classe",
    "CNAE 2.0 Subclasse" -> "cnae_subclasse",
    "Admitidos" -> "admitidos",
    "Desligados" -> "desligados",
    "Saldo" -> "saldo",
    "Estoque" -> "estoque",
    "Variação Relativa" -> "variacao_relativa",
    "Tempo de Emprego" -> "tempo_emprego")

  /** P1: drop columns if present (Spark drop is already presence-tolerant;
    * kept for parity with pipeline.py:64's conditional `undefined` drop).
    */
  def dropIfPresent(df: DataFrame, cols: String*): DataFrame = df.drop(cols: _*)

  /** P2+P3: bulk rename restricted to columns that actually exist
    * (pipeline.py:84-85 `if k in df.columns`).
    */
  def renamePresent(df: DataFrame, mapping: Map[String, String]): DataFrame = {
    val present = mapping.filter { case (from, _) => df.columns.contains(from) }
    df.withColumnsRenamed(present)
  }

  /** P4: allowlist projection — keep the intersection of `allowed` with the
    * present columns, in allowlist order (pipeline.py:178-186).
    */
  def allowlist(df: DataFrame, allowed: Seq[String]): DataFrame = {
    val present = allowed.filter(df.columns.contains)
    df.select(present.map(col): _*)
  }

  /** P7: positional/fallback column resolution (pipeline.py:97-98): pick a
    * column by preferred name, else by fallback position.
    */
  def columnOrPosition(df: DataFrame, preferred: String, position: Int): Column =
    if (df.columns.contains(preferred)) col(preferred)
    else col(df.columns(position))

  /** F3/F4+F6: cast-or-null then default — Polars `cast(strict=False)` +
    * `fill_null` (pipeline.py:126-141). `try_cast` keeps this ANSI-safe.
    */
  def coerceOrDefault(c: Column, toType: String, default: Column): Column =
    coalesce(c.try_cast(toType), default)

  /** F5: string null back-fill (`fill_null("Indefinido")`). */
  def fillString(c: Column, default: String = "Indefinido"): Column =
    coalesce(c, lit(default))

  /** Coerce a frame to a target schema: missing columns materialize as typed
    * nulls, present columns are cast-or-null'd, extra columns are dropped;
    * output column order is the schema's. One projection, no shuffles.
    */
  def conform(df: DataFrame, schema: StructType,
              stringDefault: String = "Indefinido"): DataFrame = {
    val cols = schema.fields.map { f =>
      val base =
        if (df.columns.contains(f.name)) df(f.name).try_cast(f.dataType.sql)
        else lit(null).cast(f.dataType)
      val filled = f.dataType match {
        case StringType => coalesce(base, lit(stringDefault))
        case LongType | IntegerType => coalesce(base, lit(0L).cast(f.dataType))
        case DoubleType => coalesce(base, lit(0.0d))
        case _ => base
      }
      filled.as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** P6+F9: reference-period literals (pipeline.py:113-122): attach
    * `ano_ref`, `mes_ref` and the first-of-month `data_competencia`.
    */
  def withReferencePeriod(df: DataFrame, ano: Int, mes: Int): DataFrame = df
    .withColumn("ano_ref", lit(ano.toLong))
    .withColumn("mes_ref", lit(mes.toLong))
    .withColumn("data_competencia", make_date(lit(ano), lit(mes), lit(1)))

  /** Derive the reference period from an event-time column instead of a
    * literal (the engine-native generalization used over the test tables).
    */
  def withDerivedPeriod(df: DataFrame, ts: Column): DataFrame = df
    .withColumn("ano_ref", year(ts).cast("long"))
    .withColumn("mes_ref", month(ts).cast("long"))
    .withColumn("data_competencia", trunc(ts.cast("date"), "month"))
}
