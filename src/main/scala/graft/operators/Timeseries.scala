package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series resampling — the "densify the irregular event
  * stream onto a fixed cadence" step every market-data / feature pipeline
  * needs before window math (the reference's price joins tolerate a 7-day
  * staleness for exactly this reason: the underlying series is irregular;
  * reference: src/pipelines/stage/ddl/features.sql price as-of usage).
  * Producing the grid ONCE turns every downstream consumer's as-of join
  * into a plain equi join on the grid timestamp.
  *
  * Implementation is the union-window gap-fill, not a join: observations
  * and generated grid points are unioned into one per-key stream, and a
  * single `last(struct, ignoreNulls)` running window carries the most
  * recent observation forward onto each grid row. One exchange total (the
  * union is exchanged once by the key window; the grid generator is a
  * per-key `sequence` explode off a one-row-per-key span aggregate). The
  * as-of-join alternative shuffles the observation stream AND the grid
  * and needs the binning trick to stay an equi join; the union form is
  * strictly cheaper and is what the classic warehouse gap-fill compiles
  * to.
  *
  * Determinism: grid timestamps are exact integer bin arithmetic on the
  * epoch-nanos convention; the carried value is an existing row's double
  * COPIED verbatim (no arithmetic), and the deterministic
  * `(t, obs-before-grid, id)` window order makes the carried pick unique
  * even under same-timestamp duplicates. `age_ns` (staleness of the
  * carried observation at the grid point) is one integer subtraction.
  *
  * 100 TB shape: output size is `Σ_key ceil(span_key / step)` — chosen by
  * the caller via `stepNs`, independent of event volume; a key's grid
  * lives in its key partition, so skew follows time-span skew (bounded:
  * span/step rows per key), not event-count skew. Grid bounds are
  * per-key (first grid point at or after the key's first observation —
  * every emitted row has a value; nothing is fabricated before first
  * sight of the key).
  */
object Timeseries {

  /** Resample `events` per `keyCol` onto a `stepNs` grid, forward-filling
    * `valCol` from the latest observation at-or-before each grid point.
    * Output: (key, grid_ts, value, obs_ts, age_ns) — one row per grid
    * point per key, grid_ts in [ceil(min_t/step), floor(max_t/step)]·step
    * (keys whose whole history sits strictly inside one step emit no
    * rows). `tsCol` must be integral epoch nanos; `idCol` breaks
    * same-timestamp ties (latest id wins, matching the argmax-latest
    * convention).
    */
  def resampleFfill(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, stepNs: Long): DataFrame = {
    require(stepNs > 0, "stepNs must be positive")
    val obs = events.select(col(keyCol).as("k"), col(tsCol).as("t"),
      col(idCol).as("id"), col(valCol).as("v"))
    // pure INTEGER bin arithmetic — an epoch-nanos long (~1.7e18) does not
    // fit a double mantissa, so float division here would mis-bin; ceil-div
    // for the lower bin ((t + step - 1) div step, exact for t >= 0) makes
    // the first grid point the first one at-or-after the key's first obs
    val span = obs.groupBy("k").agg(
      expr(s"(min(t) + ${stepNs - 1}L) div ${stepNs}L").as("__lo"),
      expr(s"max(t) div ${stepNs}L").as("__hi"))
    val grid = span
      .filter(col("__lo") <= col("__hi"))
      .select(col("k"), explode(sequence(col("__lo"), col("__hi"))).as("__bin"))
      .select(col("k"), (col("__bin") * stepNs).as("t"),
        lit(null).cast("long").as("id"),
        lit(null).cast(obs.schema("v").dataType).as("v"),
        lit(1).as("__grid"))
    // obs (__grid=0) sorts before grid (__grid=1) at equal t, so a grid
    // point ON an observation timestamp carries that observation; among
    // equal-t observations the LAST (highest id) wins the running pick.
    val unioned = obs.select(col("k"), col("t"), col("id"), col("v"), lit(0).as("__grid"))
      .unionByName(grid)
    val w = Window.partitionBy("k").orderBy(col("t"), col("__grid"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__last",
        last(when(col("__grid") === 0, struct(col("t").as("ot"), col("v").as("ov"))),
          ignoreNulls = true).over(w))
      .filter(col("__grid") === 1)
      .select(col("k").as(keyCol), col("t").as("grid_ts"),
        col("__last.ov").as("value"), col("__last.ot").as("obs_ts"),
        (col("t") - col("__last.ot")).as("age_ns"))
  }

  /** Exponentially-weighted moving average per key, plus the first-difference
    * and percent-change columns — the pandas `ewm`/`diff`/`pct_change`
    * trio of exploratory time-series work, in a form an external engine
    * can recompute EXACTLY.
    *
    * EWMA is an order-dependent recursion (`e_n = α·x_n + (1-α)·e_{n-1}`),
    * which iterated doubles make engine- and order-sensitive, so the
    * recursion runs in INTEGER MICRO-UNITS with a rational
    * `α = alphaNum/alphaDen` and an explicit floor at every step:
    * `e_n = ⌊(num·xu_n + (den-num)·e_{n-1}) / den⌋` (e_1 = xu_1; the floor
    * is true mathematical floor via pmod — Spark's `div` truncates toward
    * zero, which diverges from DuckDB's `//` on negative values). Every
    * step is exactly reproducible; the oracle replays the recursion with a
    * recursive CTE. The per-step floor biases each e_n down by < 1
    * micro-unit — far below any smoothing decision.
    *
    * delta / pct_change are per-row IEEE ops on verbatim doubles (one
    * subtraction; one division, null when the previous value is 0 or
    * absent) — identical expression trees both engines.
    *
    * Shape: ONE exchange. The recursion needs the key's ordered history in
    * one place, so it folds over a per-key `collect_list` (the
    * [[Behavior.sequenceMatch]] MATCH_RECOGNIZE partition contract: a
    * key's history must fit an executor row — for corpus-scale per-key
    * histories, window the input by coarse time first); the lag window
    * afterwards reuses the groupBy's hash partitioning.
    */
  def ewma(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String, alphaNum: Long, alphaDen: Long): DataFrame = {
    require(alphaNum > 0 && alphaNum <= alphaDen, "alpha must be in (0, 1]")
    val an = alphaNum
    val bn = alphaDen - alphaNum
    val step = s"($an * e.vu + $bn * element_at(acc, -1))"
    val folded = events
      .select(col(keyCol).as("k"), col(tsCol).as("t"), col(idCol).as("id"),
        col(valCol).as("v"),
        floor(col(valCol) * lit(1000000.0) + lit(0.5)).cast("long").as("vu"))
      .groupBy("k")
      .agg(array_sort(collect_list(struct(col("t"), col("id"), col("v"), col("vu"))))
        .as("__es"))
      .withColumn("__ew", expr(
        s"""aggregate(__es, cast(array() as array<bigint>), (acc, e) ->
            concat(acc, array(case when size(acc) = 0 then e.vu
              else ($step - pmod($step, $alphaDen)) div $alphaDen end)))"""))
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    folded
      .select(col("k"), posexplode(arrays_zip(col("__es"), col("__ew"))))
      .select(col("k").as(keyCol), col("col.__es.t").as(tsCol),
        col("col.__es.id").as(idCol), col("col.__es.v").as(valCol),
        col("col.__ew").as("ewma_u"))
      .withColumn("ewma", col("ewma_u").cast("double") / lit(1000000.0))
      .withColumn("__prev", lag(col(valCol), 1).over(w))
      .withColumn("delta", col(valCol) - col("__prev"))
      .withColumn("pct_change", when(col("__prev") =!= 0.0, col("delta") / col("__prev")))
      .drop("__prev")
  }
}
