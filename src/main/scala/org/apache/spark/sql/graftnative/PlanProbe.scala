package org.apache.spark.sql.graftnative

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, ReusedSubqueryExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.util.QueryExecutionListener

/** Executed-plan instrumentation for the runtime-scan census
  * (tools/PlanStats) and PlanSpec's executed-scan bounds.
  *
  * The LAZY census (planView string match) counts every scan the
  * DECLARED plan would run if nothing materialized — boundary-crossing
  * programs like the LSH pipeline read as 40+ scans there even though
  * `Boundary.Local` materializes shared stages once and the actual I/O is
  * far lower. This probe counts what EXECUTION actually scheduled:
  * FileSourceScan nodes in the AQE-final plans of every SQL action fired
  * while a listener is attached, with reused exchanges / reused
  * subqueries / in-memory relation scans counted as ZERO because they do
  * not re-read the lake. The two numbers side by side make real re-reads
  * distinguishable from lazy re-derivation.
  *
  * Lives under `org.apache.spark` because draining the listener bus
  * (without which the async QueryExecutionListener could attribute an
  * execution to the NEXT query's counters) is `private[spark]`.
  */
object PlanProbe {

  /** File scans the executed (AQE-final) plan actually contains.
    *
    * Cached relations: the FIRST InMemoryTableScan over a given cache
    * builder DID scan its child to populate the cache, so its child
    * subtree counts once (tracked in `seen`, identity-keyed per
    * measurement window); every later hit on the same cache reads memory
    * and counts zero. Pass `seen = null` for a single-plan count with no
    * cache credit (cache scans then count zero unconditionally).
    */
  def countFileScans(plan: SparkPlan, seen: java.util.Set[AnyRef] = null): Int = {
    def subs(p: SparkPlan): Int = p.subqueries.map(walk).sum
    def walk(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan) + subs(a)
      case q: QueryStageExec => walk(q.plan) + subs(q)
      case _: ReusedExchangeExec => 0
      case _: ReusedSubqueryExec => 0
      case m: InMemoryTableScanExec =>
        if (seen != null && seen.add(m.relation.cacheBuilder))
          walk(m.relation.cachedPlan)
        else 0
      case f: FileSourceScanExec => 1 + subs(f)
      case other => other.children.map(walk).sum + subs(other)
    }
    walk(plan)
  }

  /** Accumulates (sql-actions, executed file scans) across every SQL
    * action completed while registered — including the intermediate
    * actions a query runs internally (two-phase scalar reads, boundary
    * materializations), which is exactly the I/O the lazy census cannot
    * see.
    */
  final class ScanCounter extends QueryExecutionListener {
    val actions = new java.util.concurrent.atomic.AtomicInteger
    val scans = new java.util.concurrent.atomic.AtomicInteger
    // identity-keyed (a value-equal builder for a DIFFERENT cache must not
    // be collapsed) and synchronized (listener delivery is async)
    private val seenCaches: java.util.Set[AnyRef] = java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]))
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      actions.incrementAndGet()
      scans.addAndGet(countFileScans(qe.executedPlan, seenCaches))
    }
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
  }

  /** Run `body`, return (its result, sql actions fired, executed file
    * scans) — the bus is drained before reading the counters so async
    * listener delivery cannot leak an execution into the next
    * measurement.
    */
  def measure[T](spark: SparkSession)(body: => T): (T, Int, Int) = {
    val c = new ScanCounter
    spark.listenerManager.register(c)
    try {
      val r = body
      spark.sparkContext.listenerBus.waitUntilEmpty(60000)
      (r, c.actions.get, c.scans.get)
    } finally spark.listenerManager.unregister(c)
  }

  /** Drain the async listener bus (private[spark]) — exposed for tools
    * that attribute listener events to a per-query measurement window
    * (graft.tools.JobStats).
    */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(60000)
}
