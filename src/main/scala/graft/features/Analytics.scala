package graft.features

import graft.functions.Scalars
import graft.operators.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Analytics-layer enrichment (SURVEY.md §2.3 first rows, §3.1/§3.3).
  *
  * Two programs:
  *  - [[enrichEventsWithEth]] — the per-event-type pipeline of
  *    src/pipelines/analytics/transformations/transformations.sql: metadata
  *    join, blocklist anti-join, 7-day as-of price join, ETH conversion,
  *    address bucketing.
  *  - [[mergeMarketAndPositions]] — the snapshot merge of
  *    src/pipelines/analytics/historical_market_data_and_account_positions.py:37-80.
  */
object Analytics {

  /** Column spec per event type: which columns play token/quantity/index
    * (reference: analytics/defi_events.py template params — liquidations
    * convert the liquidated token and index by the liquidated account).
    */
  case class EventSpec(tokenCol: String, quantityCol: String, indexCol: String)
  val GeneralSpec: EventSpec = EventSpec("token_address", "quantity", "sender_address")
  val LiquidationSpec: EventSpec =
    EventSpec("liquidated_token_address", "quantity_liquidated", "account_address")

  /** Which as-of engine backs the price lookup (step 3).
    *
    *  - [[AsOfPath.Binned]] (default): composed range+argmax join, time-
    *    binned so a hot token's full history never cross-products against
    *    its events. KEEPS ties — multiple price rows at the argmax epoch
    *    each emit a row, mirroring the reference SQL's re-join exactly.
    *  - [[AsOfPath.Merge]]: the native [[AsOfJoin.asOfMerge]] exec — one
    *    exchange per side, per-partition streaming merge, no candidate
    *    blow-up at ANY skew. Single-match semantics: callers must
    *    canonicalize the price side to one row per (token, timestamp)
    *    first (the at-scale shape anyway); on a tie-free right side it is
    *    row-identical to Binned. Requires the session built with
    *    `spark.sql.extensions=graft.plans.GraftExtensions`.
    */
  sealed trait AsOfPath
  object AsOfPath {
    case object Binned extends AsOfPath
    case object Merge extends AsOfPath
  }

  /** transformations.sql re-expressed:
    *  1. inner join tokens metadata (decimals > 0) — broadcastable dim
    *  2. anti-join the tokens-to-drop blocklist (LEFT JOIN ... IS NULL)
    *  3. as-of join the latest price within trailing 7 days (inclusive)
    *  4. CASE zero-address ETH conversion
    *  5. `address_partition = SUBSTR(index, 3, 2)` bucket column
    *
    * Incremental: callers pre-filter `epoch_timestamp > watermark`
    * ([[graft.operators.Incremental]]); the 3×~86-bucket Athena write
    * chunking is dropped — Spark writes all 256 partitions in one job.
    */
  def enrichEventsWithEth(
      events: DataFrame,
      tokensMetadata: DataFrame, // contract_address, decimals
      tokensToDrop: DataFrame, // contract_address
      dailyPrices: DataFrame, // address, timestamp (epoch), price
      spec: EventSpec = GeneralSpec,
      asOfPath: AsOfPath = AsOfPath.Binned): DataFrame = {

    val withMeta = events
      .join(
        broadcast(tokensMetadata.filter(col("decimals") > 0)),
        events(spec.tokenCol) === tokensMetadata("contract_address"),
        "inner")
      .drop("contract_address")
      .withColumnRenamed("decimals", "token_decimal")

    val withoutBlocked = withMeta.join(
      broadcast(tokensToDrop),
      withMeta(spec.tokenCol) === tokensToDrop("contract_address"),
      "left_anti")

    val prices = dailyPrices.select(
      col("address").as(spec.tokenCol),
      col("timestamp").cast("long").as("price_epoch"),
      col("price"))

    // binned variant: row-identical to asOf, but the range stage equi-joins
    // on (token, 7-day bin) instead of token alone, so a hot token's years
    // of price history never cross-product against its events
    val withPrice = asOfPath match {
      case AsOfPath.Binned => AsOfJoin.asOfBinned(
        withoutBlocked,
        prices,
        keyCols = Seq(spec.tokenCol),
        leftTs = "epoch_timestamp",
        rightTs = "price_epoch",
        tolerance = 86400L * 7,
        rightValueCols = Seq("price"),
        rightPrefix = "")
      case AsOfPath.Merge => AsOfJoin.asOfMerge(
        withoutBlocked,
        prices,
        keyCols = Seq(spec.tokenCol),
        leftTs = "epoch_timestamp",
        rightTs = "price_epoch",
        tolerance = 86400L * 7,
        rightValueCols = Seq("price"),
        rightPrefix = "")
    }

    withPrice
      .withColumn(
        "quantity_in_eth",
        Scalars.toEth(col(spec.tokenCol), col(spec.quantityCol), col("token_decimal"), col("price")))
      .withColumn("index_address", col(spec.indexCol))
      .withColumn("address_partition", Scalars.addressBucket(col(spec.indexCol)))
      .drop("price")
  }

  /** Snapshot-aligned enrichment: positions ⋈ market data on
    * `(market_id, block_number)`, plus the per-protocol ETH reference price
    * (`name IN ('Aave interest bearing WETH','Compound Ether')`) on
    * `(block_number, protocol)`, then USD/ETH balances
    * (reference: historical_market_data_and_account_positions.py:37-80 and
    * its DDL twin).
    */
  def mergeMarketAndPositions(positions: DataFrame, marketData: DataFrame): DataFrame = {
    val md = marketData.select(
      col("id").as("md_id"),
      col("block_number").as("md_block_number"),
      col("input_token_price_usd"),
      (col("liquidation_threshold") * 0.01).as("liquidation_threshold"),
      col("decimals"))

    // the reference keeps this CTE un-deduplicated (one row per qualifying
    // market snapshot) — do the same, duplicates and all
    val ethPrice = marketData
      .filter(col("name").isin("Aave interest bearing WETH", "Compound Ether"))
      .select(
        col("block_number").as("ep_block_number"),
        col("protocol").as("ep_protocol"),
        col("input_token_price_usd").as("input_token_price_usd_protocol"))

    positions
      .join(
        md,
        positions("market_id") === md("md_id") &&
          positions("block_number") === md("md_block_number"),
        "inner")
      .join(
        broadcast(ethPrice),
        positions("block_number") === ethPrice("ep_block_number") &&
          positions("protocol") === ethPrice("ep_protocol"),
        "inner")
      .withColumn(
        "balance_in_usd",
        col("balance") * col("input_token_price_usd") / pow(lit(10.0), col("decimals")))
      .withColumn(
        "balance_in_eth",
        // reference zero-guard: CASE WHEN usd = 0 OR protocol price = 0 THEN 0
        when(col("balance_in_usd") === 0.0 || col("input_token_price_usd_protocol") === 0.0, lit(0.0))
          .otherwise((lit(1.0) / col("input_token_price_usd_protocol")) * col("balance_in_usd")))
      .withColumn("address_partition", Scalars.addressBucket(col("account")))
      .drop("md_id", "md_block_number", "ep_block_number", "ep_protocol")
  }
}
