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
  * Deliberately narrow: fires only when (a) `spark.graft.pairJoin.auto`
  * is on (default), (b) the join has a condition (pure cross joins keep
  * their semantics), (c) NO hint is present — an explicit `broadcast()`
  * or `.hint(...)` from the author always wins — and (d) both sides
  * output at least one array column. Idempotent under the optimizer's
  * fixed-point batches because a rewritten join no longer matches (c).
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
      plan.transformUp {
        case j: Join if j.hint == JoinHint.NONE && j.condition.isDefined &&
            wide(j.left) && wide(j.right) =>
          val h = Some(HintInfo(strategy = Some(strat)))
          j.copy(hint = JoinHint(h, h))
      }
    }
}
