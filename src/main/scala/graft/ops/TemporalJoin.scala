package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators: as-of join, keyed range join, and a key-less
  * interval join via grid binning.
  *
  * Spark has no ASOF JOIN operator (the reference ecosystem — DuckDB, kdb,
  * Flink — does), so these compose it from primitives that scale:
  *
  *  - [[asOfJoin]] is the union-and-window formulation: tag both inputs,
  *    union them, and carry the most recent right-side value forward with
  *    `last(_, ignoreNulls)` over a per-key window. ONE shuffle on the key,
  *    no join at all — compare a naive theta-join (`l.ts >= r.ts` +
  *    row_number), which materializes O(|L|·|R|) per key before pruning.
  *  - [[rangeJoinKeyed]] is an ordinary equi-join on the key with the range
  *    as a post-join filter — Catalyst plans a shuffle/broadcast hash join
  *    on the equi key, so the range never degrades it to nested-loop.
  *  - [[intervalJoinBinned]] handles the no-equi-key case: both sides are
  *    mapped onto a fixed time grid (intervals explode to every cell they
  *    overlap; points land in exactly one cell), turning the interval
  *    predicate into an equi-join on the cell id + a residual filter. This
  *    is the standard trick for making Spark's planner shuffle-partition an
  *    interval join instead of falling back to BroadcastNestedLoopJoin,
  *    which is quadratic and OOMs at scale.
  */
object TemporalJoin {

  /** As-of join: for each left row, the latest right row with the same key
    * and `rightTime <= leftTime`.
    *
    * Contract: the right side must be unique per (keys, time) — pre-dedup
    * with an aggregate if it is not, or the carried value is unspecified.
    *
    * `carry` maps output column names to right-side columns to bring along.
    * Left rows with no prior right row get nulls in the carried columns.
    *
    * Scale shape: one shuffle of |L| + |R| rows on `keys`, then a single
    * sorted window pass per partition. Skewed keys behave like any other
    * window (AQE cannot split a window partition — salt upstream if one key
    * dominates).
    */
  def asOfJoin(left: DataFrame, leftKeys: Seq[String], leftTime: Column,
               right: DataFrame, rightKeys: Seq[String], rightTime: Column,
               carry: Map[String, Column]): DataFrame = {
    val carryNames = carry.keys.toSeq.sorted
    require(carryNames.nonEmpty, "asOfJoin needs at least one carried column")
    val leftCols = left.columns.toSeq
    require(carryNames.intersect(leftCols).isEmpty,
      s"carry names ${carryNames.intersect(leftCols).mkString(",")} collide " +
        "with left columns — alias the carried columns")
    // All carried values travel in ONE struct that is non-null exactly on
    // right rows: last(_, ignoreNulls) then skips the left-row placeholders
    // but still carries a matched row whose individual fields are NULL
    // (a per-column last would wrongly skip those too).
    val rTagged = right.select(
      rightKeys.zip(leftKeys).map { case (rk, lk) => col(rk).as(lk) } ++
        Seq(rightTime.as("__t"), lit(0).as("__side"),
          struct(carryNames.map(n => carry(n).as(n)): _*).as("__carry")) ++
        leftCols.map(c => lit(null).as(s"__l_$c")): _*)
    val lTagged = left.select(
      leftKeys.map(col) ++ Seq(leftTime.as("__t"), lit(1).as("__side"),
        lit(null).as("__carry")) ++
        leftCols.map(c => col(c).as(s"__l_$c")): _*)
    // Positional union: schemas are constructed identically above.
    // Right rows (side=0) sort before left rows (side=1) at equal
    // timestamps, so a right row AT the left time is visible to it
    // (>= semantics, as DuckDB ASOF JOIN defines it).
    val u = rTagged.union(lTagged)
    val w = Window.partitionBy(leftKeys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn("__carry", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        carryNames.map(n => col(s"__carry.$n").as(n)): _*)
  }

  /** [[asOfJoin]] with a max-staleness TOLERANCE (pandas `merge_asof
    * tolerance` semantics): a match older than `toleranceSeconds` before
    * the left row's time is discarded — carries come back NULL, exactly
    * as if no right row preceded it. The common production form ("join
    * the latest quote, but never one more than an hour stale"); the
    * unbounded form silently attributes arbitrarily ancient context.
    *
    * Implementation rides [[asOfJoin]] unchanged: the matched right time
    * travels as one extra carried field and a post-join staleness
    * predicate blanks the carry struct — same one-shuffle plan, no
    * second window. Determinism: the staleness test is an integer
    * epoch-microsecond comparison.
    */
  def asOfJoinTolerance(left: DataFrame, leftKeys: Seq[String],
                        leftTime: Column, right: DataFrame,
                        rightKeys: Seq[String], rightTime: Column,
                        carry: Map[String, Column],
                        toleranceSeconds: Long): DataFrame = {
    require(toleranceSeconds >= 0L,
      s"toleranceSeconds must be >= 0, got $toleranceSeconds")
    val reserved = "__asof_matched_us"
    require(!carry.contains(reserved), s"carry name $reserved is reserved")
    val carryNames = carry.keys.toSeq.sorted
    val joined = asOfJoin(left, leftKeys, leftTime, right, rightKeys,
      rightTime,
      carry + (reserved -> unix_micros(rightTime.cast("timestamp"))))
    val stale = col(reserved).isNull ||
      unix_micros(leftTime.cast("timestamp")) - col(reserved) >
        lit(toleranceSeconds * 1000000L)
    carryNames.foldLeft(joined) { (df, n) =>
      df.withColumn(n, when(stale, lit(null)).otherwise(col(n)))
    }.drop(reserved)
  }

  /** Keyed range join: left rows joined to right rows with the same key and
    * `rightTime` in `[leftTime + loOffset, leftTime + hiOffset)`.
    * Offsets are Columns of CalendarInterval (e.g. `expr("INTERVAL 1 HOUR")`)
    * or any expression addable to a timestamp.
    *
    * The equi key keeps this a hash join; the range is a cheap residual.
    */
  def rangeJoinKeyed(left: DataFrame, leftKeys: Seq[String], leftTime: String,
                     right: DataFrame, rightKeys: Seq[String], rightTime: String,
                     loOffset: Column, hiOffset: Column,
                     joinType: String = "inner"): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    val keyCond = leftKeys.zip(rightKeys)
      .map { case (lk, rk) => l(lk) === r(rk) }.reduce(_ && _)
    val lt = l(leftTime)
    val rt = r(rightTime)
    l.join(r, keyCond && rt >= lt + loOffset && rt < lt + hiOffset, joinType)
  }

  /** Key-less interval join: points joined to every interval `[lo, hi)`
    * containing them, via grid binning.
    *
    * Intervals are exploded to each `binMicros`-wide grid cell they overlap;
    * points map to exactly one cell; the join is an equi-join on the cell id
    * with the exact range as a residual filter. Because a point belongs to
    * one cell only, each (interval, point) pair appears at most once — no
    * dedup needed.
    *
    * Choose `binMicros` near the typical interval width: each interval then
    * explodes to ~2 cells, and cell ids spread the shuffle uniformly over
    * time. (A 100 TB month of events at 5-minute bins is ~9k distinct cells
    * per replica-free shuffle key — combine with a coarse date partition for
    * more.)
    */
  def intervalJoinBinned(points: DataFrame, pointTime: Column,
                         intervals: DataFrame, lo: Column, hi: Column,
                         binMicros: Long): DataFrame = {
    val iv = intervals
      .withColumn("__lo_us", unix_micros(lo))
      .withColumn("__hi_us", unix_micros(hi))
      // malformed hi <= lo intervals match nothing (residual is lo <= pt < hi)
      // but would make `sequence` below generate a DESCENDING cell range —
      // one bad row with hi far below lo explodes into a huge array (job
      // blowup, not a wrong answer). Drop them before the explode.
      .filter(col("__hi_us") > col("__lo_us"))
      .withColumn("__cell",
        explode(sequence(floor(col("__lo_us") / binMicros),
          // hi is exclusive: an interval ending exactly on a cell boundary
          // does not overlap that cell
          floor((col("__hi_us") - 1) / binMicros))))
    val pt = points
      .withColumn("__pt_us", unix_micros(pointTime))
      .withColumn("__cell", floor(col("__pt_us") / binMicros))
    iv.join(pt, Seq("__cell"))
      .filter(col("__pt_us") >= col("__lo_us") && col("__pt_us") < col("__hi_us"))
      .drop("__cell", "__lo_us", "__hi_us", "__pt_us")
  }
}
