package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral event analytics over a (user, type, time) event stream —
  * the funnel / cohort-retention / time-weighted-exposure triad every
  * event-analytics engine ships, expressed as plain keyed aggregations so
  * they scale the way a groupBy scales.
  *
  * All three cluster by the user key: on a table bucketed or
  * pre-partitioned by user (`Layout.writeBucketed`) every stage below
  * runs without a further exchange of the event stream; otherwise the
  * stream is exchanged once and the per-user intermediate tables (one row
  * per user — orders of magnitude smaller) carry the rest.
  */
object Behavior {

  /** Ordered-funnel completion: for each user, the earliest strictly
    * increasing chain of timestamps through `steps` (t1 = first step-1
    * event; t_k = first step-k event AFTER t_{k-1}). Returns one row per
    * user: the chain timestamps (null once the chain breaks) and
    * `reached` = number of completed steps.
    *
    * Stage k touches only step-k events joined against the one-row-per-
    * user chain so far — the classic funnel join-chain; nothing pairwise,
    * nothing ordered globally.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String], maxStepGap: Long = Long.MaxValue): DataFrame = {
    require(steps.nonEmpty && steps.size <= 8, "1..8 funnel steps")
    require(maxStepGap > 0, "maxStepGap must be positive")
    val ev = events.select(col(userCol).as("user"), col(typeCol).as("tp"), col(tsCol).as("t"))
    val users = ev.select("user").distinct()
    var chain = ev.filter(col("tp") === steps.head)
      .groupBy("user").agg(min(col("t")).as("t1"))
    // keep each stage's (user, t_k) projection: a user who stalls at step k
    // must still surface t_1..t_k, not fall out with the full chain
    val stages = scala.collection.mutable.ArrayBuffer(chain.select("user", "t1"))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      // TIMED funnel (the product-analytics conversion window): each step
      // must land within `maxStepGap` of the previous one — the greedy
      // first-occurrence semantics of the untimed chain, with the window
      // as one more pushable predicate. Written as a DIFFERENCE: the
      // conjoined `t > prev` makes `t - prev` non-negative, so the
      // comparison can't wrap even for epoch-nanos timestamps with a
      // large finite gap (`prev + maxStepGap` could overflow long and,
      // under non-ANSI Spark, silently drop every conversion)
      val withinGap =
        if (maxStepGap == Long.MaxValue) lit(true)
        else col("t") - col(prev) <= maxStepGap
      chain = ev.filter(col("tp") === st)
        .join(chain, "user")
        .filter(col("t") > col(prev) && withinGap)
        .groupBy((col("user") +: (1 to i).map(j => col(s"t$j"))): _*)
        .agg(min(col("t")).as(cur))
      stages += chain.select("user", cur)
    }
    val tCols = steps.indices.map(i => s"t${i + 1}")
    val joined = stages.foldLeft(users)((a, s) => a.join(s, Seq("user"), "left"))
    // ascending fold: each later non-null step OVERRIDES the accumulated
    // count, so the deepest completed step wins (null-chain is monotone —
    // t_{k+1} can only exist under t_k)
    val reached = tCols.zipWithIndex.foldLeft(lit(0)) { case (acc, (c, i)) =>
      when(col(c).isNotNull, lit(i + 1)).otherwise(acc)
    }
    joined.select(
      (col("user").as(userCol) +: tCols.map(col)) :+ reached.cast("int").as("reached"): _*)
  }

  /** MATCH_RECOGNIZE-style event-sequence matcher: the FIRST occurrence of
    * `pattern` (a sequence of event types) per user in strict time order
    * (ties broken by `idCol`), one row per user:
    * `(user, t1..tm, matched)` — the matched events' timestamps (null
    * past the break point) and whether the full pattern matched.
    *
    *  - `contiguous = false` (gapped): the pattern as a SUBSEQUENCE of the
    *    user's ordered stream with strictly increasing timestamps — the
    *    [[funnel]] chain semantics (greedy earliest match, which is the
    *    first match; BehaviorSpec property-tests the equivalence). Runs as
    *    the real MATCH_RECOGNIZE shape: one keyed collect of the user's
    *    ordered (t, id, tp) events and a single codegen'd `aggregate` fold
    *    advancing the pattern state machine — one exchange, no joins. The
    *    per-user event list must fit an executor row (the same partition
    *    contract SQL MATCH_RECOGNIZE has); for corpus-scale per-user
    *    histories prefer the join-chain [[funnel]].
    *  - `contiguous = true`: the pattern must occupy CONSECUTIVE events of
    *    the user's ordered stream (no other event between steps) — `m-1`
    *    window leads mark every start position, the earliest wins. One
    *    window + one keyed reduction; the stream is exchanged once and
    *    never collected.
    *
    * `tsCol` must be integral (the repo's epoch-nanos convention).
    */
  def sequenceMatch(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      idCol: String, pattern: Seq[String], contiguous: Boolean): DataFrame = {
    require(pattern.nonEmpty && pattern.size <= 8, "1..8 pattern steps")
    val m = pattern.size
    val ev = events.select(col(userCol).as("user"), col(typeCol).as("tp"),
      col(tsCol).as("t"), col(idCol).as("id"))
    val users = ev.select("user").distinct()
    val matchedTs: DataFrame =
      if (contiguous) {
        val w = Window.partitionBy("user").orderBy(col("t"), col("id"))
        val leads = (1 until m).map(k =>
          lead(struct(col("t"), col("tp")), k).over(w).as(s"__e$k"))
        val starts = ev
          .select(Seq(col("user"), col("t"), col("id"), col("tp")) ++ leads: _*)
          .filter(((col("tp") === pattern.head) +:
            (1 until m).map(k => col(s"__e$k.tp") === pattern(k))).reduce(_ && _))
        starts
          .withColumn("__rn", row_number().over(
            Window.partitionBy("user").orderBy(col("t"), col("id"))))
          .filter(col("__rn") === 1)
          .select(col("user") +: col("t").as("t1") +:
            (1 until m).map(k => col(s"__e$k.t").as(s"t${k + 1}")): _*)
      } else {
        val patLit = array(pattern.map(lit): _*)
        val folded = ev
          .groupBy("user")
          .agg(array_sort(collect_list(struct(col("t"), col("id"), col("tp")))).as("__es"))
          .select(col("user"),
            aggregate(col("__es"), array().cast("array<long>"), (acc, e) =>
              when(size(acc) < m &&
                  e.getField("tp") === element_at(patLit, size(acc) + 1) &&
                  (size(acc) === 0 || e.getField("t") > element_at(acc, size(acc))),
                concat(acc, array(e.getField("t")))).otherwise(acc)).as("__m"))
        folded.select(col("user") +:
          (1 to m).map(k => element_at(col("__m"), k).as(s"t$k")): _*)
          // a user whose fold matched nothing still emitted a row of nulls;
          // normalize to the contiguous form (row only when t1 exists) so
          // the final left join below is the single null-filling path
          .filter(col("t1").isNotNull)
      }
    val tCols = (1 to m).map(k => s"t$k")
    users.join(matchedTs, Seq("user"), "left")
      .select((col("user").as(userCol) +: tCols.map(col)) :+
        col(s"t$m").isNotNull.as("matched"): _*)
  }

  /** Cohort retention matrix: cohort = the user's first active day;
    * output (cohort_day, offset_days, n_active) — how many of each
    * cohort's users were active again `offset` days later (offset 0 = the
    * cohort's size). Exact integer day arithmetic; two aggregations and
    * one join, all keyed by user/cohort.
    */
  def retentionCohorts(events: DataFrame, userCol: String, dayCol: String): DataFrame = {
    val act = events.select(col(userCol).as("user"), col(dayCol).as("day")).distinct()
    val cohorts = act.groupBy("user").agg(min("day").as("cohort_day"))
    act.join(cohorts, "user")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_days"))
      .agg(count_distinct(col("user")).as("n_active"))
  }

  /** First-order Markov transition matrix of the event stream: for each
    * observed (current type → next type) transition within a user's
    * ordered history, its count and conditional probability
    * P(next | current). The probability is ONE division of two exact
    * integer counts — bit-identical on every IEEE engine, no
    * quantization needed. One user-keyed window + one (from, to)
    * aggregation; the per-from normalizer runs as a window over the
    * already-aggregated (|types|² ≤ tiny) frame, so the event stream is
    * exchanged twice total regardless of corpus size.
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val wf = Window.partitionBy("from_type")
    events
      .select(col(userCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .withColumn("prob",
        col("n").cast("double") / sum(col("n")).over(wf).cast("double"))
  }

  /** Gap-based sessionization — the batch twin of the engine's streaming
    * session windows (`streaming_session_window`): within a user's
    * time-ordered stream (ties broken by `idCol`), an event starts a new
    * session when it arrives more than `gapNs` after its predecessor.
    * One row per session: `(user, session_idx, session_start, session_end,
    * n_events, dur_ns)` with `session_idx` 1-based in time order.
    *
    * All integer arithmetic on the epoch-nanos convention — exact on any
    * engine. One exchange total: the boundary flag and its running sum are
    * per-user windows, and the per-(user, session) aggregation's grouping
    * keys are a SUPERSET of the window's partitioning key, so Catalyst
    * reuses the user hash partitioning instead of exchanging again.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapNs: Long): DataFrame = {
    require(gapNs > 0, "gapNs must be positive")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("__new",
        when(col(tsCol) - lag(col(tsCol), 1).over(w) <= gapNs, 0L).otherwise(1L))
      .withColumn("session_idx", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .withColumn("dur_ns", col("session_end") - col("session_start"))
  }

  /** Per-key WINSORIZATION at a rational tail fraction `pNum/pDen`: clamp
    * each value into the key's [p, 1-p] discrete-quantile range — the
    * outlier-TAMING companion of [[robustAnomalies]]'s outlier-FLAGGING
    * (feature pipelines winsorize heavy-tailed monetary values before any
    * mean/stddev statistic is trusted).
    *
    * Discrete rank rule (no interpolation arithmetic, the
    * `agg_median_disc` discipline): `lo` = the value at rank
    * `max(1, ceil(n·p))` of the key's `(value, id)` order, `hi` = the value
    * at the mirrored rank `n + 1 - loRank`; the clamp copies existing
    * doubles verbatim. Keys too small for the tail fraction (n·p < 1)
    * clamp to [min, max] — a no-op, exactly the right degenerate.
    *
    * One exchange: rank window, count window, the conditional-aggregate
    * bounds extraction, and the bounds join are all keyed by `keyCol`.
    */
  def winsorize(events: DataFrame, keyCol: String, idCol: String, valCol: String,
      pNum: Long, pDen: Long): DataFrame = {
    require(pNum > 0 && 2 * pNum < pDen, "tail fraction must be in (0, 1/2)")
    val wr = Window.partitionBy(keyCol).orderBy(col(valCol), col(idCol))
    val wc = Window.partitionBy(keyCol)
    val ranked = events
      .withColumn("__rn", row_number().over(wr))
      .withColumn("__n", count(lit(1)).over(wc))
      .withColumn("__lor", greatest(lit(1L), expr(s"(__n * $pNum + ${pDen - 1}) div $pDen")))
    val bounds = ranked
      .groupBy(col(keyCol))
      .agg(
        max(when(col("__rn") === col("__lor"), col(valCol))).as("lo"),
        max(when(col("__rn") === col("__n") + 1L - col("__lor"), col(valCol))).as("hi"))
    events.join(bounds, keyCol)
      .withColumn("value_winsorized", least(greatest(col(valCol), col("lo")), col("hi")))
  }

  /** Per-key Shannon entropy of the categorical column — the behavioral
    * DIVERSITY feature (a user touching one protocol scores 0 bits; a
    * uniform spread over k types scores log2 k), and the same statistic
    * data curation uses for label/source balance. Each type's term
    * `(c/n)·log2(n/c)` is built from exact integer counts with ONE
    * floor-quantization to nano-units (the tfidf/surprisal discipline —
    * the transcendental is taken once per term, sums are exact integers).
    * Output: `(key, n_events, n_types, entropy_u, entropy)`.
    *
    * One exchange: the (key, type) count's hash partitioning serves the
    * per-key total window and the final per-key aggregation.
    */
  def typeEntropy(events: DataFrame, keyCol: String, typeCol: String): DataFrame = {
    val wc = Window.partitionBy(keyCol)
    events
      .groupBy(col(keyCol), col(typeCol)).agg(count(lit(1)).as("__c"))
      .withColumn("__n", sum(col("__c")).over(wc))
      .withColumn("__t", floor((col("__c").cast("double") / col("__n").cast("double")) *
        log2(col("__n").cast("double") / col("__c").cast("double")) * lit(1e9)).cast("long"))
      .groupBy(col(keyCol))
      .agg(max(col("__n")).as("n_events"), count(lit(1)).as("n_types"),
        sum(col("__t")).as("entropy_u"))
      .withColumn("entropy", col("entropy_u").cast("double") / lit(1e9))
  }

  /** Per-group GINI COEFFICIENT of a per-key aggregate — the
    * concentration statistic of position/volume analytics ("how unequal
    * are the wallets' exposures inside each protocol"): 0 = perfectly
    * even, →1 = one key holds everything. Computed by the sorted-rank
    * identity `G = Σ_i (2i − n − 1)·x_(i) / (n·Σx)` on MICRO-UNIT
    * integer values (the davgQ quantize-once rule; per-key sums
    * accumulate decimal-exact first), so the numerator and denominator
    * are exact integers and the only float op is their final division.
    * Keys with a zero group total emit a null gini. Requires
    * non-negative values (validated — Gini is undefined over mixed-sign
    * aggregates). Output: `(group, n_keys, total_u, gini)`.
    *
    * Shape: one keyed aggregation + one per-group ranked window over the
    * one-row-per-key frame + one per-group aggregation.
    */
  def giniByGroup(events: DataFrame, groupCol: String, keyCol: String,
      valCol: String): DataFrame = {
    val sums = events
      .groupBy(col(groupCol), col(keyCol))
      .agg(graft.functions.Scalars.dsum(col(valCol)).as("__sv"))
      .withColumn("__vu", floor(col("__sv") * lit(1000000.0) + lit(0.5)).cast("long"))
    val wr = Window.partitionBy(groupCol).orderBy(col("__vu"), col(keyCol))
    val wc = Window.partitionBy(groupCol)
    sums
      .withColumn("__vu", when(col("__vu") >= 0, col("__vu")).otherwise(raise_error(
        lit("giniByGroup: negative per-key aggregate — Gini needs non-negative values"))))
      .withColumn("__rn", row_number().over(wr))
      .withColumn("__n", count(lit(1)).over(wc))
      .groupBy(col(groupCol))
      .agg(max(col("__n")).as("n_keys"),
        sum(col("__vu").cast("decimal(38,0)")).cast("long").as("total_u"),
        sum(((col("__rn") * 2L - col("__n") - 1L) * col("__vu")).cast("decimal(38,0)"))
          .cast("long").as("__num_u"))
      .select(col(groupCol), col("n_keys"), col("total_u"),
        // n·total as a DOUBLE product of two exact ints (same IEEE tree in
        // the oracle) — the long product could overflow at corpus scale
        when(col("total_u") > 0,
          col("__num_u").cast("double") /
            (col("n_keys").cast("double") * col("total_u").cast("double"))).as("gini"))
  }

  /** Time-weighted average of a per-event level (balance/exposure): each
    * event's value holds until the user's next event; the average weights
    * each value by its holding duration — the standard TWAB shape of
    * position analytics, where a plain AVG over events would let burst
    * activity drown out long-held state.
    *
    * One window (user, ordered by time with an id tie-break) + one keyed
    * aggregation = one exchange. The value is quantized ONCE to integer
    * micro-units (the [[graft.functions.Scalars]] `davgQ` floor rule —
    * casting a ~1e17 value×nanos double straight to DECIMAL(38,6) hits
    * the cross-engine half-unit tie hazard, measured: 29 last-ulp diffs
    * at sf0.01); micro-units × nanos then accumulates EXACTLY in
    * decimal(38,0) (int128-class), and only the final division is
    * floating point — one double cast of an exact integer, bit-identical
    * everywhere. Users with fewer than 2 events have no held duration
    * and are excluded.
    */
  /** Robust per-key anomaly flags: an event is anomalous when its value
    * deviates from the key's DISCRETE median by more than
    * `threshNum/threshDen` MADs — the median/MAD z-score, the standard
    * robust outlier rule (a mean/stddev z-score is itself dragged by the
    * outliers it is meant to find). Output: one row per event
    * `(user, event_id, value, med, mad, dev, is_anomaly)`.
    *
    * Exactness: median and MAD are discrete selections (existing doubles,
    * the `agg_median_disc` rank rule — no interpolation arithmetic), the
    * deviation subtracts identical doubles, and the threshold compare
    * cross-multiplies by exactly-representable integer literals
    * (`dev * den > mad * num` — ONE IEEE product each side, the same
    * expression tree on every engine, so the compare is bit-identical;
    * a decimal cast here would re-introduce the half-unit tie hazard).
    * Keys where mad = 0 (over half the values identical) flag any nonzero
    * deviation.
    *
    * 100 TB shape: two ranked windows + one join, all keyed by the user —
    * the event stream is hash-exchanged once and reused (the windows and
    * the stats join share the partitioning); the per-key stats frame is
    * one row per key. Skewed keys cost a per-key sort (window rank), the
    * same bound as every ranked statistic.
    */
  def robustAnomalies(events: DataFrame, userCol: String, idCol: String,
      valCol: String, threshNum: Long, threshDen: Long): DataFrame = {
    require(threshNum > 0 && threshDen > 0, "threshold must be positive")
    val wr = Window.partitionBy(userCol).orderBy(col(valCol), col(idCol))
    val wc = Window.partitionBy(userCol)
    val med = events
      .withColumn("__rn", row_number().over(wr))
      .withColumn("__n", count(lit(1)).over(wc))
      .filter(col("__rn") === expr("(__n + 1) div 2"))
      .select(col(userCol), col(valCol).as("med"))
    val wd = Window.partitionBy(userCol).orderBy(col("dev"), col(idCol))
    val withDev = events.join(med, userCol)
      .withColumn("dev", abs(col(valCol) - col("med")))
    val mad = withDev
      .withColumn("__rn", row_number().over(wd))
      .withColumn("__n", count(lit(1)).over(wc))
      .filter(col("__rn") === expr("(__n + 1) div 2"))
      .select(col(userCol), col("dev").as("mad"))
    withDev.join(mad, userCol)
      .select(col(userCol), col(idCol), col(valCol), col("med"), col("mad"), col("dev"),
        (col("dev") * lit(threshDen.toDouble) >
          col("mad") * lit(threshNum.toDouble)).as("is_anomaly"))
  }

  def timeWeightedAvg(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, valCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("__dur", lead(col(tsCol), 1).over(w) - col(tsCol))
      .filter(col("__dur").isNotNull)
      .withColumn("__vu", floor(col(valCol) * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy(col(userCol))
      .agg(
        sum(col("__vu").cast("decimal(38,0)") * col("__dur")).as("__s"),
        sum(col("__dur")).as("held_ns"))
      .select(col(userCol),
        (col("__s").cast("double") / lit(1000000.0) / col("held_ns").cast("double"))
          .as("twab"),
        col("held_ns"))
  }
}
