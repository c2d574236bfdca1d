package graft.features

import graft.functions.Scalars
import graft.functions.Scalars.dsum
import graft.operators.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The flagship feature build: assembles the 10 view outputs into the
  * 28-column `defi_features` table, reproducing
  * src/pipelines/features/transformations/defi_features_calculation.sql
  * step-for-step — the 7-link COALESCE-defaulted left-join chain on the
  * wallet spine (DISTINCT per link exactly where the reference has one:
  * the historical-health link at :49-60 has none), the account->sender
  * reassignment sub-pipelines for liquidation (:75-104) and current health
  * factor (:105-139), the clamp-diff derived columns (:140-152), and the
  * final rename/sentinel projection (:153-190).
  */
object Assembly {

  /** @param spine        wallet spine (wallet_address) — [[Views.distinctAddresses]]
    * @param borrowEvents analytics borrow events (sender_address, account_address)
    * @param repayF       [[Views.repayFeatures]] output; etc.
    */
  def featureAssembly(
      spine: DataFrame,
      borrowEvents: DataFrame,
      repayF: DataFrame,
      borrowF: DataFrame,
      creditMixF: DataFrame,
      redeemsF: DataFrame,
      lendingF: DataFrame,
      historicalF: DataFrame,
      countAboveF: DataFrame,
      liquidationF: DataFrame,
      currentHfF: DataFrame): DataFrame = {

    // The reference puts SELECT DISTINCT on (almost) every link. Here every
    // feature frame is unique-keyed by construction (each is a groupBy
    // output, or a groupBy-after-merge) and the spine is distinct, so a
    // left join can never duplicate a spine row and the per-link DISTINCT
    // is a provable no-op — skipping it removes 8 full-width shuffles of
    // the widening spine (the reference's DISTINCTs guard Athena CTEs it
    // cannot prove unique; Spark doesn't propagate uniqueness either, so
    // we encode the proof here instead of paying the shuffle).
    def link(acc: DataFrame, f: DataFrame, key: String, defaults: Map[String, Any],
        dedup: Boolean = false): DataFrame =
      Relational.leftFeatureJoin(acc, f, "wallet_address", key,
        defaults.map { case (k, v) =>
          k -> (v match {
            case d: Double => lit(d)
            case l: Long => lit(l)
          })
        }, dedup)

    // the 7-link feature chain (defi_features_calculation.sql:1-68)
    var acc: DataFrame = spine
    acc = link(acc, repayF, "sender_address", Map(
      "borrow_total_eth_repaid_sum" -> 0.0, "borrow_total_eth_repaid_avg" -> 0.0,
      "borrow_total_repays" -> 0L))
    acc = link(acc, borrowF, "sender_address", Map(
      "loan_amount_eth_sum" -> 0.0, "loan_amount_eth_avg" -> 0.0,
      "borrow_total_borrows" -> 0L))
    acc = link(acc, creditMixF, "sender_address", Map(
      "credit_mix_count_borrow_protocol" -> 0L, "credit_mix_count_lending_protocol" -> 0L,
      "credit_mix_count_protocol" -> 0L))
    acc = link(acc, redeemsF, "sender_address", Map("lending_sum_redeems" -> 0.0))
    acc = link(acc, lendingF, "sender_address", Map(
      "lending_total_deposits" -> 0L, "lending_time_since_first_lending" -> 0L,
      "total_deposits_in_eth" -> 0.0))
    acc = link(acc, historicalF, "sender_address", Map(
      "historical_max_risk_factor" -> 0.0, "misc_avg_total_collateral_eth" -> 0.0,
      "misc_avg_available_borrows_eth" -> 0.0, "historical_weighted_avg_risk_factor" -> 0.0,
      "historical_average_risk_factor" -> 0.0)) // also the one link the reference itself does NOT dedup (:49-60)
    acc = link(acc, countAboveF, "sender_address",
      Map("historical_count_above_threshold" -> 0L))

    // account -> sender reassignment spine (:69-74)
    val pairs = borrowEvents.select("sender_address", "account_address").distinct()

    // liquidation reassignment (:75-104): per-pair coalesce THEN per-sender
    // SUM/MIN — the order of defaulting matters (SURVEY.md §7.4.1)
    val liqPerSender = pairs
      .join(liquidationF.withColumnRenamed("account_address", "l_account"),
        pairs("account_address") === col("l_account"), "left")
      .select(
        col("sender_address"),
        coalesce(col("liquidation_total_liquidations"), lit(0L)).as("ltl"),
        coalesce(col("liquidation_total_amount_eth"), lit(0.0)).as("ltae"),
        coalesce(col("liquidation_time_since_last_liquidated"), lit(0L)).as("ltsll"))
      .groupBy("sender_address")
      .agg(
        coalesce(sum(col("ltl")), lit(0L)).as("liquidation_total_liquidations"),
        coalesce(dsum(col("ltae")), lit(0.0)).as("liquidation_total_amount_eth"),
        coalesce(min(col("ltsll")), lit(0L)).as("liquidation_time_since_last_liquidated"))
    acc = link(acc, liqPerSender, "sender_address", Map(
      "liquidation_total_liquidations" -> 0L, "liquidation_total_amount_eth" -> 0.0,
      "liquidation_time_since_last_liquidated" -> 0L))

    // current-health-factor reassignment (:105-139): raw (un-defaulted)
    // per-pair values, per-sender SUM/MAX, defaults applied after
    val curPerSender = pairs
      .join(currentHfF.withColumnRenamed("account", "c_account"),
        pairs("account_address") === col("c_account"), "left")
      .groupBy("sender_address")
      .agg(
        coalesce(dsum(col("misc_total_collateral_eth")), lit(0.0)).as("misc_total_collateral_eth"),
        coalesce(dsum(col("misc_available_borrows_eth")), lit(0.0)).as("misc_available_borrows_eth"),
        coalesce(max(col("current_risk_factor")), lit(0.0)).as("current_risk_factor"),
        coalesce(max(col("borrow_weighted_avg_risk_factor")), lit(0.0)).as("borrow_weighted_avg_risk_factor"),
        coalesce(max(col("borrow_current_risk_factor_capped")), lit(0.0)).as("borrow_current_risk_factor_capped"))
    acc = link(acc, curPerSender, "sender_address", Map(
      "misc_total_collateral_eth" -> 0.0, "misc_available_borrows_eth" -> 0.0,
      "current_risk_factor" -> 0.0, "borrow_weighted_avg_risk_factor" -> 0.0,
      "borrow_current_risk_factor_capped" -> 0.0))

    // derived diffs (:140-152)
    acc = acc
      .withColumn("borrow_total_current_loan_eth",
        Scalars.clampDiff(col("loan_amount_eth_sum"), col("borrow_total_eth_repaid_sum")))
      .withColumn("withdraw_deposit_diff_if_positive_eth",
        Scalars.clampDiff(col("lending_sum_redeems"), col("total_deposits_in_eth")))

    // final rename/sentinel projection (:153-190) — the 28-column contract
    acc.select(
      col("wallet_address"),
      col("credit_mix_count_borrow_protocol").as("unique_borrow_protocol_count"),
      col("credit_mix_count_lending_protocol").as("unique_lending_protocol_count"),
      col("misc_total_collateral_eth").as("total_collateral_eth"),
      col("current_risk_factor").as("risk_factor"),
      col("misc_available_borrows_eth").as("total_available_borrows_eth"),
      col("lending_total_deposits").as("deposit_count"),
      Scalars.zeroToSentinel(col("lending_time_since_first_lending")).as("time_since_first_deposit"),
      col("total_deposits_in_eth").as("deposit_amount_sum_eth"),
      col("liquidation_total_liquidations").as("liquidation_count"),
      col("liquidation_total_amount_eth").as("liquidation_amount_sum_eth"),
      Scalars.zeroToSentinel(col("liquidation_time_since_last_liquidated")).as("time_since_last_liquidated"),
      col("lending_sum_redeems").as("withdraw_amount_sum_eth"),
      col("loan_amount_eth_sum").as("borrow_amount_sum_eth"),
      col("loan_amount_eth_avg").as("borrow_amount_avg_eth"),
      col("borrow_total_borrows").as("borrow_count"),
      col("borrow_total_eth_repaid_sum").as("repay_amount_sum_eth"),
      col("borrow_total_eth_repaid_avg").as("repay_amount_avg_eth"),
      col("borrow_total_repays").as("repay_count"),
      col("borrow_total_current_loan_eth").as("borrow_repay_diff_eth"),
      col("withdraw_deposit_diff_if_positive_eth"),
      col("misc_avg_available_borrows_eth").as("total_available_borrows_avg_eth"),
      col("historical_weighted_avg_risk_factor").as("avg_weighted_risk_factor"),
      col("historical_average_risk_factor").as("avg_risk_factor"),
      col("historical_max_risk_factor").as("max_risk_factor"),
      col("historical_count_above_threshold").as("risk_factor_above_threshold_daily_count"),
      col("misc_avg_total_collateral_eth").as("total_collateral_avg_eth"))
  }
}
