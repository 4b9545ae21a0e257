package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, JoinHint, LogicalPlan, SHUFFLE_HASH, SHUFFLE_MERGE}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.ArrayType

import graft.GraftConf

/** Optimizer rule: apply the configured pair-join strategy
  * (`spark.graft.pairJoin.hint`) automatically to joins where BOTH sides
  * carry array columns and the author left the strategy to the planner.
  *
  * Rationale (measured, see ARCHITECTURE.md): when the build side carries
  * wide arrays (hashed shingle sets, embeddings), the planner's default
  * choices are the two bad options — a driver-side broadcast build is
  * GC-sensitive and intermittently 3-4× slower, and sort-merge pays to
  * sort rows whose array payload makes comparisons and spills expensive.
  * The engine's own operators pin `shuffle_hash` explicitly; this rule
  * extends the same protection to user-authored joins in sessions
  * configured with the graft extensions.
  *
  * Deliberately narrow and OPT-IN (`spark.graft.pairJoin.auto`, default
  * off): a strategy hint removes the join from inner-join reordering and
  * AQE's runtime re-selection, so blanket application would be a bad
  * global default. When enabled it fires only when (a) the join has a
  * condition (pure cross joins keep their semantics), (b) NO hint is
  * present — an explicit `broadcast()` or `.hint(...)` from the author
  * always wins — (c) both sides output at least one array column, and
  * (d) NEITHER side's size estimate is under the auto-broadcast
  * threshold, so a join the planner would satisfy with a tiny broadcast
  * build keeps that plan (the fact side is never force-shuffled against
  * a small dim). Idempotent under the optimizer's fixed-point batches
  * because a rewritten join no longer matches (b).
  */
case class AutoPairJoinHint(spark: SparkSession) extends Rule[LogicalPlan] {

  private def wide(p: LogicalPlan): Boolean =
    p.output.exists(a => a.dataType.isInstanceOf[ArrayType])

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!GraftConf.autoPairJoin(spark)) plan
    else {
      val strat = GraftConf.pairJoinHint(spark) match {
        case "merge" => SHUFFLE_MERGE
        case "broadcast" => BROADCAST
        case _ => SHUFFLE_HASH
      }
      val broadcastable = spark.sessionState.conf.autoBroadcastJoinThreshold
      plan.transformUp {
        case j: Join if j.hint == JoinHint.NONE && j.condition.isDefined &&
            wide(j.left) && wide(j.right) &&
            (broadcastable < 0 ||
              (j.left.stats.sizeInBytes > broadcastable &&
               j.right.stats.sizeInBytes > broadcastable)) =>
          val h = Some(HintInfo(strategy = Some(strat)))
          j.copy(hint = JoinHint(h, h))
      }
    }
}

object AutoPairJoinHint {
  /** Idempotently add the rule to a live session (the
    * `spark.sql.extensions` path is [[GraftExtensions]]).
    */
  def register(spark: SparkSession): Unit = {
    val opts = spark.experimental.extraOptimizations
    if (!opts.exists(_.isInstanceOf[AutoPairJoinHint]))
      spark.experimental.extraOptimizations = opts :+ AutoPairJoinHint(spark)
  }
}
