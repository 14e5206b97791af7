package graft.plans

import graft.sources.http.HttpTable
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Optimizer rule: joins against an `http-full-cache` relation broadcast
  * the cached side unconditionally.
  *
  * The reference's defining design point is that the lookup table is a
  * FULL in-memory snapshot — every task holds (or can hold) the whole
  * payload, which is exactly Spark's broadcast-join contract (reference:
  * README.md:16 "full cache", HttpInputFormatProvider.scala:80-81 single
  * split). The source already reports honest size/row statistics, which
  * lets Spark auto-broadcast *when the payload is below
  * `autoBroadcastJoinThreshold`* — but a cluster tuned with a low (or
  * disabled, -1) threshold would silently degrade the lookup join into a
  * full shuffle of the PROBE side: at 100 TB, a shuffle of the fact
  * stream to co-locate with a table that is by construction
  * memory-resident. This rule encodes the source's semantic guarantee
  * where statistics cannot: any join side consisting solely of
  * `http-full-cache` scans (filters/projections on top are fine — that's
  * still cached data) gets a BROADCAST hint, unless the user pinned a
  * different strategy explicitly.
  *
  * Injected via [[graft.extensions.GraftExtensions]] (`injectOptimizerRule`,
  * so it runs with the operator-optimization batch after hints have been
  * folded into [[Join.hint]]).
  */
case class BroadcastFullCacheJoins(session: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] {

  /** True iff every leaf of `side` is an http-full-cache relation — the
    * side is derived from cached data only. A side merely *containing* a
    * cache scan (e.g. joined with a fact table below) must not broadcast. */
  private def fullCacheOnly(side: LogicalPlan): Boolean = {
    val leaves = side.collectLeaves()
    leaves.nonEmpty && leaves.forall {
      case r: DataSourceV2Relation => r.table.isInstanceOf[HttpTable]
      case _ => false
    }
  }

  private def withBroadcast(h: Option[HintInfo]): Option[HintInfo] =
    h match {
      case Some(info) if info.strategy.isDefined => h // user pinned a strategy
      case Some(info) => Some(info.copy(strategy = Some(BROADCAST)))
      case None => Some(HintInfo(strategy = Some(BROADCAST)))
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, _, _, hint) =>
      val newHint = JoinHint(
        if (fullCacheOnly(l)) withBroadcast(hint.leftHint) else hint.leftHint,
        if (fullCacheOnly(r)) withBroadcast(hint.rightHint) else hint.rightHint)
      if (newHint == hint) j else j.copy(hint = newHint)
  }
}
