package graft.idempotent

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent-load operators (SURVEY.md §2.4 J2/J3, §2.2 K4, §2.10 O4).
  *
  * The reference has two idempotency flavors:
  *  1. incremental anti-join against already-loaded keys
  *     (dags/etl_municipios.py:116-150, the "V22" DAG), and
  *  2. delete-partition-then-insert (pipeline.py:172-189).
  *
  * Spark-first restatements:
  *  1. `left_anti` join; history side is just the distinct key projection,
  *     which Catalyst prunes to the key columns at the scan.
  *  2. dynamic partition overwrite on a lake table partitioned by the same
  *     keys the reference DELETEs by — a metadata-level swap instead of a
  *     row-level delete, which is the scalable equivalent at 100 TB.
  */
object Idempotent {

  /** Cardinality report of an incremental load (dags/etl_municipios.py:144-150). */
  final case class LoadStats(received: Long, ignored: Long, loaded: Long)

  /** J2: rows of `incoming` whose key tuple is absent from `history`. */
  def newRows(incoming: DataFrame, history: DataFrame,
              keys: Seq[String]): DataFrame = {
    // Defensive key-cast parity (the reference's "V22 fix",
    // dags/etl_municipios.py:127-133): align history key types to incoming's.
    val incomingTypes = incoming.select(keys.map(col): _*).schema
      .fields.map(f => f.name -> f.dataType).toMap
    val alignedHistory = history.select(
      keys.map(k => col(k).try_cast(incomingTypes(k).sql).as(k)): _*)
    incoming.join(alignedHistory, keys, "left_anti")
  }

  /** J3: the semi-join complement count used for the ignored-rows report. */
  def alreadyLoaded(incoming: DataFrame, history: DataFrame,
                    keys: Seq[String]): DataFrame =
    incoming.join(history.select(keys.map(col): _*), keys, "left_semi")

  /** J2+O4+K1: full incremental append into a parquet lake table. Returns
    * the received/ignored/loaded counts; skips the write when nothing is new
    * (dags/etl_municipios.py:152-154).
    */
  def incrementalAppend(spark: SparkSession, incoming: DataFrame,
                        tablePath: String, keys: Seq[String]): LoadStats = {
    val history =
      try spark.read.parquet(tablePath).select(keys.map(col): _*).distinct()
      catch { case scala.util.control.NonFatal(_) =>
        graft.ingest.Ingest.emptyWithSchema(
          spark, incoming.select(keys.map(col): _*).schema) }
    val fresh = newRows(incoming, history, keys)
    // One pass for both counts: received via a cheap count on incoming,
    // loaded via count of the (cached) delta actually written.
    fresh.cache()
    val loaded = fresh.count()
    val received = incoming.count()
    if (loaded > 0) fresh.write.mode(SaveMode.Append).parquet(tablePath)
    fresh.unpersist()
    LoadStats(received, received - loaded, loaded)
  }

  /** K4: delete-partition-then-insert ≡ dynamic partition overwrite. Only
    * the partitions present in `df` are replaced; everything else is
    * untouched — the exact semantics of the reference's scoped DELETE
    * (pipeline.py:174-176) without a full-table rewrite.
    */
  def overwritePartitions(df: DataFrame, tablePath: String,
                          partitionKeys: Seq[String]): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionKeys: _*)
      .parquet(tablePath)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** §2.6 engine-native generalization: dedup-to-latest — keep, per key, the
    * newest row by `orderCols` (descending, with a deterministic tiebreak).
    * This is the windowed restatement of the reference's "skip already-loaded,
    * newest file wins" semantics.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String],
                   orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col(_).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Apply a change-data-capture log to produce final table state — the
    * lakehouse MERGE a CDC stream (Debezium-style I/U/D rows with a
    * per-key sequence) resolves to: the LAST operation per key wins
    * (row_number over seq desc, [[latestPerKey]]'s machinery), and a
    * final delete drops the key entirely. `deleteOp` rows need no
    * payload. Returns one row per surviving key with the payload
    * columns.
    *
    * `seq` must totally order each key's operations (a log sequence
    * number / LSN — CDC's own contract); the window partition is one
    * key's operation history, so per-task memory is bounded by the
    * hottest key's churn, not the log. One shuffle on the key.
    */
  def applyCdc(log: DataFrame, keyCols: Seq[String], seq: Column,
               op: Column, payloadCols: Seq[String],
               deleteOp: String = "D"): DataFrame = {
    require(payloadCols.nonEmpty, "applyCdc needs payload columns")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(seq.desc)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && op =!= deleteOp)
      .select(keyCols.map(col) ++ payloadCols.map(col): _*)
  }

  /** Incremental aggregate maintenance: fold a delta's partial aggregates
    * into a running state table — the warehouse refresh that reprocesses
    * one day's partition instead of the full history. Only valid for
    * re-aggregatable measures (counts, sums — store averages as
    * sum + count); with DECIMAL accumulators the merge is EXACTLY equal to
    * a full recompute (the law the q83 oracle pins by computing the direct
    * aggregation over all data).
    *
    * Cost: shuffles |state| + |delta| GROUPED rows — one row per key, not
    * per event — so a daily refresh over years of history moves megabytes,
    * not the 100 TB fact table.
    */
  def mergeAggState(state: DataFrame, delta: DataFrame, keys: Seq[String],
                    measures: Seq[String]): DataFrame = {
    require(measures.nonEmpty, "mergeAggState needs at least one measure")
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(measures.head)).as(measures.head),
        measures.tail.map(c => sum(col(c)).as(c)): _*)
  }
}
