package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources (SURVEY.md §2.1). Spark-first restatements of the reference's
  * ingestion surface:
  *
  *  - S1 sanitizing JSON reader ("Leitura Blindada", pipeline.py:41-49):
  *    scrub quoted `"INF"`, `"-INF"`, `"NaN"` tokens to JSON null before
  *    parsing, because a BI extractor emits them as strings inside numeric
  *    fields.
  *  - S2 nested-JSON unwrap (pipeline.py:51-52): if the document's top level
  *    is an object, the record list lives under its first key.
  *  - S4 CSV delimiter fallback (pipeline.py:90-94): try `;`, and if the
  *    result collapses to a single column re-read with `,`.
  *  - S7 empty-relation fallback (dags/etl_municipios.py:123-125): on source
  *    failure, return an empty frame with an explicit schema so downstream
  *    joins still resolve.
  *  - S8 newest-file pick (dags/etl_municipios.py:64-69).
  *
  * All readers return lazy DataFrames; only cheap driver-side metadata work
  * (file listing, header sniffing) happens eagerly.
  */
object Ingest {

  /** S1+S2+S3: read a JSON document file, scrub non-numeric numeric tokens,
    * unwrap the record array, and return one row per record.
    *
    * Implementation is `spark.read.text` (wholetext) -> `regexp_replace` ->
    * `from_json(schema_of_json)` -> `explode`, so the sanitize step runs as a
    * Catalyst expression rather than a driver-side string pass: on a large
    * landing directory each file is scrubbed/parsed inside executors.
    */
  def sanitizedJson(spark: SparkSession, path: String,
                    recordSchema: Option[StructType] = None): DataFrame = {
    import spark.implicits._
    val raw = spark.read.option("wholetext", "true").text(path)
    // Quoted-string tokens only: `: "INF"`, `: "-INF"`, `: "NaN"` → null.
    // (Bare NaN/Infinity literals are already handled by the JSON parser's
    // allowNonNumericNumbers; the reference's extractor quotes them.)
    val cleaned = raw.select(
      regexp_replace($"value", "\"(-?INF|NaN)\"", "null").as("value"))

    // Unwrap: top-level object → first key's array; top-level array → itself.
    // Normalize driver-side on one sampled document (schema inference needs a
    // pass anyway), then parse all files with the inferred element schema.
    val sampled = cleaned.head().getString(0)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = mapper.readTree(sampled)
    val arrayText =
      if (tree.isObject) {
        val firstField = tree.fieldNames().next()
        tree.get(firstField).toString
      } else tree.toString

    val elementSchema = recordSchema.getOrElse {
      val ddl = spark.range(1)
        .select(schema_of_json(lit(arrayText)).as("s")).head().getString(0)
      DataType.fromDDL(ddl) match {
        case ArrayType(s: StructType, _) => s
        case s: StructType               => s
        case other => throw new IllegalArgumentException(
          s"cannot infer record schema from $other")
      }
    }

    val unwrapExpr =
      when($"value".rlike("^\\s*\\["), $"value")
        .otherwise(regexp_replace(regexp_replace(
          $"value", "^\\s*\\{\\s*\"[^\"]*\"\\s*:", ""), "\\}\\s*$", ""))

    cleaned
      .select(from_json(unwrapExpr, ArrayType(elementSchema)).as("records"))
      .select(explode($"records").as("r"))
      .select($"r.*")
  }

  /** S4: CSV read with `;` first and a one-retry fallback to `,` when the
    * header collapses to a single column. The retry decision reads only the
    * header line (limit 1), not the data.
    */
  def csvWithDelimiterFallback(spark: SparkSession, path: String,
                               header: Boolean = true): DataFrame = {
    def read(sep: String) = spark.read
      .option("sep", sep)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)
    val semi = read(";")
    if (semi.columns.length <= 1) read(",") else semi
  }

  /** S5: plain `;`-separated CSV (dags/meu_pipeline.py:55). */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", ";").option("header", "true").csv(path)

  /** S6: JDBC source with full query pushdown — the SQL string executes
    * database-side (dags/etl_municipios.py:121-122's
    * `SELECT DISTINCT municipio, ano_ref, mes_ref`), so projection +
    * distinct never cross the wire unaggregated.
    */
  def jdbcQuery(spark: SparkSession, url: String, sql: String,
                props: Map[String, String] = Map.empty): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", url).option("query", sql)
    props.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  /** Lake-format matrix, read side: ORC — Spark's second native columnar
    * format (same predicate-pushdown / column-pruning / vectorized-read
    * contract as parquet, warehouse ecosystems that standardized on ORC
    * read it in place). q230 hash-gates the full ORC write→read loop
    * against the events identity oracle.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S7: empty relation with an explicit schema, used as the graceful
    * fallback when a history/source read fails so that downstream anti-joins
    * still type-check (the reference's "V22 fix" shape).
    */
  def emptyWithSchema(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** S8: newest file in a directory matching a glob, by modification time.
    * Driver-side Hadoop FS metadata only — no data read.
    */
  def newestFile(spark: SparkSession, globPath: String): Option[String] = {
    val path = new Path(globPath)
    val fs = FileSystem.get(path.toUri, spark.sparkContext.hadoopConfiguration)
    val statuses = fs.globStatus(path)
    if (statuses == null || statuses.isEmpty) None
    else Some(statuses.maxBy(_.getModificationTime).getPath.toString)
  }

  /** Read with graceful degradation: on any failure return the empty-schema
    * fallback (dags/etl_municipios.py:123-125 semantics).
    */
  def orEmpty(spark: SparkSession, schema: StructType)(
      read: => DataFrame): DataFrame =
    try read catch { case scala.util.control.NonFatal(_) =>
      emptyWithSchema(spark, schema) }
}
