package graft.operators

import org.apache.spark.sql.DataFrame

/** A pluggable materialization boundary for multi-consumer intermediates.
  *
  * Spark re-executes a DataFrame subtree once per consumer (exchange reuse
  * only collapses byte-identical exchanges, which multi-branch pipelines
  * rarely produce — the minhash-LSH plan evaluated its signature projection
  * 100+ times before this existed). A boundary forces the intermediate ONCE
  * and hands every consumer the materialized result. The VALUES are
  * identical under every strategy — only where the bytes live differs:
  *
  *  - [[Boundary.None]]: no materialization; right for single-consumer
  *    intermediates or plan-only inspection.
  *  - [[Boundary.Local]]: `localCheckpoint` — blocks pinned in executor
  *    block managers. Cheapest, but blocks die with executors, so it is a
  *    single-app, healthy-cluster tool (the local/bench default).
  *  - [[Boundary.AtPath]]: write parquet + read back — the 100 TB
  *    deployment shape: the materialized corpus survives executor loss,
  *    feeds later pipeline stages (or days) for free, and its read side
  *    gets scan-level column pruning that checkpoint blocks don't.
  */
sealed trait Boundary {
  def apply(df: DataFrame): DataFrame
}

object Boundary {
  /** Total MATERIALIZING applications ([[Local]]/[[AtPath]]; [[None]]
    * never counts) — the observable PlanSpec's planView-coverage
    * contract derives from: a registry query whose `run` moves this
    * counter crosses a boundary and must expose a lazy `planView` twin,
    * so plan-hygiene sweeps can never be blinded by a checkpoint. Purely
    * diagnostic; never read on a data path.
    */
  private[graft] val crossings = new java.util.concurrent.atomic.AtomicLong

  /** Count a materialization performed OUTSIDE [[Boundary.apply]] — a
    * persist-based stage cache (the assembly pattern) or an
    * aggregate-action build (the bloom join's filter) — toward the same
    * derived planView contract: the plan the consumer sees afterwards
    * hides work exactly like a checkpoint does.
    */
  private[graft] def recordExternal(): Unit = crossings.incrementAndGet()

  case object None extends Boundary {
    def apply(df: DataFrame): DataFrame = df
  }

  case object Local extends Boundary {
    def apply(df: DataFrame): DataFrame = {
      crossings.incrementAndGet()
      // LAZY: the blocks materialize inside the FIRST consumer's job
      // instead of a dedicated action per boundary (an eager checkpoint
      // cost the minhash pipeline 3 extra jobs; the blocks, the plan
      // truncation, and every consumer's reuse are identical). Safe
      // because boundary inputs here are pure transforms of immutable
      // sources — nothing upstream is deleted between apply and the
      // first action. Concurrent AQE stages racing the first
      // materialization serialize per block in BlockManager.getOrElseUpdate.
      df.localCheckpoint(eager = false)
    }
  }

  /** Each application lands in its own subdirectory, so one AtPath instance
    * can serve every boundary a multi-stage pipeline crosses.
    */
  final case class AtPath(dir: String) extends Boundary {
    private val n = new java.util.concurrent.atomic.AtomicInteger
    def apply(df: DataFrame): DataFrame = {
      crossings.incrementAndGet()
      val sub = s"$dir/b${n.getAndIncrement()}"
      df.write.mode("overwrite").parquet(sub)
      df.sparkSession.read.parquet(sub)
    }
  }
}
