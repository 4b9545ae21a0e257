package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment joins (SURVEY.md §2.4 J1 + §2.10 O5).
  *
  * The reference enriches facts with an IBGE municipality code through a
  * left join on a normalized key (`lower(strip(municipio))`,
  * pipeline.py:96-106), falling back to `codigo_ibge = 0` when enrichment
  * fails (pipeline.py:107-111).
  *
  * Spark-first: the dimension side (~645 municipalities; generally any
  * dimension orders of magnitude smaller than the fact table) is broadcast,
  * so at 100 TB the fact table never shuffles for this join.
  */
object Enrich {

  /** F1+F2 normalized join key. */
  def normKey(c: Column): Column = lower(trim(c))

  /** J1: left-join `facts` with a small `dim` on a normalized string key.
    *
    * @param factKey   fact-side column holding the raw key
    * @param dimKey    dim-side column holding the raw key
    * @param payload   dim-side columns to carry over (renamed as given)
    */
  def broadcastLeftJoin(facts: DataFrame, dim: DataFrame,
                        factKey: Column, dimKey: Column,
                        payload: Map[String, Column]): DataFrame = {
    val dimSide = dim.select(
      (normKey(dimKey).as("__join_key") +:
        payload.toSeq.sortBy(_._1).map { case (n, c) => c.as(n) }): _*)
    facts
      .withColumn("__join_key", normKey(factKey))
      .join(broadcast(dimSide), Seq("__join_key"), "left")
      .drop("__join_key")
  }

  /** J1+O5: codigo_ibge enrichment with the reference's graceful fallback —
    * unmatched (or entirely failed) lookups get `codigo_ibge = 0`
    * (pipeline.py:107-111).
    */
  def withCodigoIbge(facts: DataFrame, dim: DataFrame,
                     factKey: Column, dimKey: Column,
                     dimCode: Column): DataFrame = {
    val joined =
      try broadcastLeftJoin(facts, dim, factKey, dimKey,
        Map("__codigo_ibge_tmp" -> dimCode))
      catch { case scala.util.control.NonFatal(_) =>
        facts.withColumn("__codigo_ibge_tmp", lit(null).cast("long")) }
    joined
      .withColumn("codigo_ibge",
        coalesce(col("__codigo_ibge_tmp").try_cast("long"), lit(0L)))
      .drop("__codigo_ibge_tmp")
  }

  /** SCD Type-2 snapshot merge: diff the current dimension against a new
    * snapshot and emit the versioned rows — unchanged keys stay open,
    * changed keys get their old version closed (`valid_to = effective`)
    * and a new open version, deleted keys close, inserted keys open. The
    * dimension-history primitive of every warehouse load.
    *
    * ONE full-outer equi-join on the key, executed once: each joined row
    * maps to an array of its 0–2 output versions which is exploded
    * map-side (a filter+union formulation would re-execute the join per
    * output branch). Attribute comparison happens on packed structs so
    * any attr width is one null-safe comparison (null attr values compare
    * equal — no version churn from stable NULLs). At scale both snapshots
    * shuffle once on the key; if the incoming snapshot is a small delta
    * the planner broadcasts it.
    *
    * PRECONDITION: the key is unique within EACH snapshot (standard for a
    * dimension). Duplicate keys fan out through the join and would emit
    * multiple open versions per key; dedup upstream
    * (e.g. `Idempotent.latestPerKey`) before merging.
    *
    * Output: key cols + attr cols + (valid_from, valid_to, is_current),
    * with `valid_to = openEnd` sentinel on open rows.
    *
    * ITERATIVE USE: by default (`validFromCol = None`) every surviving old
    * version is stamped with the `initial` sentinel as valid_from — a
    * one-shot two-snapshot diff. To chain merges day over day, pass
    * `validFromCol = Some("valid_from")` and feed the PREVIOUS merge's
    * open rows (`is_current`) back as `current`: each old version then
    * keeps its real effective date instead of being reset to `initial`.
    */
  def scd2Merge(current: DataFrame, incoming: DataFrame,
                keyCols: Seq[String], attrCols: Seq[String],
                effective: String, initial: String = "1900-01-01",
                openEnd: String = "9999-12-31",
                validFromCol: Option[String] = None): DataFrame = {
    val curFrom = validFromCol.map(col).getOrElse(lit(initial))
    val c = current.select(keyCols.map(col) :+
      struct(attrCols.map(col): _*).as("__cur") :+
      curFrom.cast("string").as("__from"): _*)
    val n = incoming.select(keyCols.map(col) :+
      struct(attrCols.map(col): _*).as("__new"): _*)
    val j = c.join(n, keyCols, "full_outer")
    def version(attrs: Column, from: Column, to: Column, open: Boolean) =
      struct(attrs.as("a"), from.as("f"), to.as("t"), lit(open).as("o"))
    val changed = col("__cur").isNotNull && col("__new").isNotNull &&
      !(col("__cur") <=> col("__new"))
    val from = coalesce(col("__from"), lit(initial))
    val variants = array(
      when(col("__cur").isNotNull && (col("__new").isNull || changed),
        version(col("__cur"), from, lit(effective), open = false)),
      when(col("__cur").isNotNull && (col("__cur") <=> col("__new")),
        version(col("__cur"), from, lit(openEnd), open = true)),
      when(col("__new").isNotNull && (col("__cur").isNull || changed),
        version(col("__new"), lit(effective), lit(openEnd), open = true)))
    j.select(keyCols.map(col) :+
        explode(filter(variants, v => v.isNotNull)).as("__v"): _*)
      .select(keyCols.map(col) ++
        attrCols.map(a => col("__v.a").getField(a).as(a)) ++
        Seq(col("__v.f").as("valid_from"), col("__v.t").as("valid_to"),
          col("__v.o").as("is_current")): _*)
  }

  /** Point-in-time reconstruction over an [[scd2Merge]] history: the
    * table state as of `date` — rows whose [valid_from, valid_to)
    * interval covers it (ISO date strings compare lexicographically, so
    * this is a pure string-range filter; no date parsing on the gate
    * path). The query SCD2 exists to answer; composing it with the merge
    * yields the reconstruction LAW the gate tests: as-of BEFORE the
    * effective date returns exactly the pre-merge table, as-of AFTER
    * returns exactly the post-merge table — the oracle is the source
    * frames verbatim, zero re-derivation.
    */
  def scd2SnapshotAt(history: DataFrame, date: String): DataFrame = {
    require(date.matches("\\d{4}-\\d{2}-\\d{2}"),
      s"date must be ISO yyyy-MM-dd, got $date")
    history.filter(col("valid_from") <= date && col("valid_to") > date)
      .drop("valid_from", "valid_to", "is_current")
  }

  /** Survivorship merge (golden record): collapse duplicate records per
    * entity key into one canonical row by per-attribute rules — the step
    * AFTER matching ([[graft.ops.Dedup.fuzzyMatchBlocked]] finds the
    * groups; this merges them): `minCols`/`maxCols` take the extreme
    * value (canonical id, latest price), `modalCols` take the most
    * frequent value with a deterministic smallest-value tie-break (the
    * consensus attribute). Returns one row per key:
    * (key, n_records, min_*, max_*, modal_*).
    *
    * Scale shape: min/max ride ONE hash aggregation over the key;
    * each modal column adds a (key, value) count aggregation + a
    * per-key rank window (partition bounded by the key's distinct
    * values) + one equi-join back — modal columns cost what they cost,
    * stated rather than hidden. All decisions are count/order-based —
    * no floats, bit-identical in any engine.
    */
  def goldenRecord(df: DataFrame, key: Column, minCols: Seq[String],
                   maxCols: Seq[String],
                   modalCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minCols.nonEmpty || maxCols.nonEmpty || modalCols.nonEmpty,
      "goldenRecord needs at least one survivorship rule")
    val keyed = df.select(key.as("__k") +:
      (minCols ++ maxCols ++ modalCols).distinct.map(col): _*)
      .localCheckpoint() // base agg + one pass per modal column
    val aggs = count(lit(1)).as("n_records") +:
      (minCols.map(c => min(col(c)).as(s"min_$c")) ++
        maxCols.map(c => max(col(c)).as(s"max_$c")))
    val base = keyed.groupBy(col("__k")).agg(aggs.head, aggs.tail: _*)
    modalCols.foldLeft(base) { (acc, c) =>
      val w = Window.partitionBy(col("__k"))
        .orderBy(col("__n").desc, col(c).asc)
      val modal = keyed.filter(col(c).isNotNull)
        .groupBy(col("__k"), col(c))
        .agg(count(lit(1)).as("__n"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("__k"), col(c).as(s"modal_$c"))
      acc.join(modal, Seq("__k"), "left")
    }.withColumnRenamed("__k", "key")
  }

  /** Snapshot diff — the lakehouse "what changed between versions"
    * readout [[scd2Merge]] acts on, surfaced as data: one row per key
    * that was ADDED, REMOVED, or CHANGED between the old and new
    * snapshot, with the sorted comma-joined list of differing columns
    * for changed keys (null for added/removed). Unchanged keys are
    * omitted — the diff is delta-sized, never snapshot-sized. Returns
    * (key, change, changed_cols).
    *
    * Scale shape: one full-outer equi-join on the key plus per-row
    * column comparisons — no window, no second pass. Comparisons are
    * null-safe (`<=>` ≡ SQL IS NOT DISTINCT FROM), so a column moving
    * to/from NULL counts as a change rather than vanishing from the
    * audit.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                   compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff needs columns to compare")
    val o = oldDf.select(col(keyCol) +:
      compareCols.map(c => col(c).as(s"__o_$c")) :+
      lit(1).as("__in_old"): _*)
    val n = newDf.select(col(keyCol) +:
      compareCols.map(c => col(c).as(s"__n_$c")) :+
      lit(1).as("__in_new"): _*)
    val diffs = compareCols.sorted.map(c =>
      when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c)))
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("change",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(diffs.map(_.isNotNull).reduce(_ || _), lit("changed")))
      .filter(col("change").isNotNull)
      .withColumn("changed_cols",
        when(col("change") === "changed",
          concat_ws(",", filter(array(diffs: _*), d => d.isNotNull))))
      .select(col(keyCol), col("change"), col("changed_cols"))
  }
}
