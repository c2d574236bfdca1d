package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-layer normalization: raw ingested shapes -> fixed, typed, snake_case
  * tables (SURVEY.md §2.2, FIXTURES.md §A).
  *
  * Reference: src/pipelines/stage/transformations/stage_tranformation_queries.py
  * (events), src/pipelines/stage/historical_market_data.py:15-28 (markets),
  * src/pipelines/stage/historical_account_positions.py:11-29 (positions).
  * Every transform is projection + rename + cast + LOWER — pure map-side,
  * no shuffle except the trailing DISTINCT where the reference has one.
  */
object Stage {

  /** General event staging: lowercase addresses, epoch from timestamp, typed
    * quantity. Liquidation events carry three extra columns
    * (stage_tranformation_queries.py:24-47).
    */
  def stageEvents(raw: DataFrame, liquidation: Boolean = false): DataFrame = {
    val base = raw.select(
      Seq(
        col("block_number").cast("long"),
        col("log_index").cast("long"),
        col("transaction_hash"),
        col("timestamp").cast("timestamp"),
        unix_timestamp(col("timestamp").cast("timestamp")).cast("long").as("epoch_timestamp"),
        col("protocol_name"),
        col("contract_version"),
        lower(col("market_address")).as("market_address"),
        lower(col("token_address")).as("token_address"),
        col("category"),
        lower(col("account_address")).as("account_address"),
        col("quantity").cast("double"),
        lower(col("sender_address")).as("sender_address"),
        date_format(col("timestamp"), "yyyy").as("year"),
        date_format(col("timestamp"), "M").as("month")) ++
        (if (liquidation)
           Seq(
             lower(col("liquidated_token_address")).as("liquidated_token_address"),
             lower(col("liquidator_address")).as("liquidator_address"),
             col("quantity_liquidated").cast("double"))
         else Seq.empty): _*)
    base
  }

  /** Market-data staging: DISTINCT + double casts + nested struct extraction
    * (`inputToken.decimals`).
    */
  def stageMarketData(raw: DataFrame): DataFrame =
    raw.select(
      col("liquidationThreshold").cast("double").as("liquidation_threshold"),
      col("name"),
      col("inputTokenPriceUSD").cast("double").as("input_token_price_usd"),
      // reference keeps market-data id unmodified (only positions lowercase
      // market.id/account.id) — subgraph ids are already lowercase hex
      col("id"),
      col("inputToken.decimals").cast("int").as("decimals"),
      col("protocol"),
      col("block_number").cast("long"),
      col("timestamp").cast("timestamp").as("block_timestamp"),
      date_format(col("timestamp"), "yyyy").as("year"),
      date_format(col("timestamp"), "M").as("month"))
      .distinct()

  /** Positions staging: DISTINCT + balance cast + struct access
    * (`market.name`, `market.id`, `account.id`) + lowercase.
    */
  def stagePositions(raw: DataFrame): DataFrame =
    raw.select(
      col("balance").cast("double").as("balance"),
      lower(col("id")).as("id"),
      col("isCollateral").cast("boolean").as("is_collateral"),
      col("market.name").as("market"),
      lower(col("market.id")).as("market_id"),
      col("side"),
      lower(col("account.id")).as("account"),
      col("block_number").cast("long"),
      col("protocol"),
      col("timestamp").cast("timestamp").as("block_timestamp"),
      date_format(col("timestamp"), "yyyy").as("year"),
      date_format(col("timestamp"), "M").as("month"))
      .distinct()
}
