package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-stage ordered funnel over an event log: for users who performed
  * stage 0 < stage 1 < ... < stage N-1 strictly in event-time order, the
  * earliest completion time of every stage (the frontier is greedy:
  * each stage's time is the minimum event time strictly after the
  * previous stage's chosen time — for "earliest full completion"
  * semantics greedy IS optimal, since taking any later stage-k time only
  * shrinks the set of valid stage-k+1 events).
  *
  * Each stage adds one type-pruned aggregation joined to the previous
  * frontier, everything keyed by the user column: N aggregations + N-1
  * equi-joins, no window over the full event stream, each stage's
  * event-type predicate pushed to its scan. The 3-stage specialization
  * is oracle-gated as q95/q97; the general form as q102 (4 stages, with
  * a generated oracle CTE chain).
  */
object Funnel {

  def funnel(events: DataFrame, user: Column, ts: Column, typ: Column,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"stages must be distinct: $stages")
    def tcol(i: Int) = s"t_${stages(i)}"
    val first = events.filter(typ === stages.head)
      .groupBy(user.as("user_id"))
      .agg(min(ts).as(tcol(0)))
    stages.indices.drop(1).foldLeft(first) { (frontier, i) =>
      val carried = (0 until i).map(tcol)
      events.filter(typ === stages(i))
        .select(user.as("user_id"), ts.as("__ts"))
        .join(frontier, "user_id")
        .filter(col("__ts") > col(tcol(i - 1)))
        .groupBy(col("user_id") +: carried.map(col): _*)
        .agg(min(col("__ts")).as(tcol(i)))
    }
  }
}
