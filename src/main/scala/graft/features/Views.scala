package graft.features

import graft.functions.Scalars
import graft.functions.Scalars.{davg, davgQ, dsum, healthFactor}
import graft.operators.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's 10 feature views as pure `DataFrame => DataFrame`
  * programs, named after their view files
  * (src/pipelines/features/transformations/view_defi_*.sql). Each mirrors
  * the view's semantics branch-for-branch — including the vestigial
  * COALESCEs, the per-site UNION-vs-UNION-ALL choices, and the `>=` argmax
  * join — per SURVEY.md §7.4's landmine list. Divergences, both deliberate:
  *
  *  - `current_timestamp` is an injected `asOfEpoch` literal
  *    (SURVEY.md §7.4.5 — determinism);
  *  - money/ratio sums/avgs use decimal-exact accumulation
  *    ([[Scalars.dsum]]/[[Scalars.davg]]) so results are reproducible
  *    across partition orders (§7.4.6).
  *
  * Expected input shapes are FIXTURES.md §A: analytics events carry
  * (sender_address, account_address, transaction_hash, quantity_in_eth,
  * epoch_timestamp, protocol_name); merged positions carry (account,
  * block_number, protocol, side, is_collateral, balance_in_usd,
  * balance_in_eth, liquidation_threshold).
  */
object Views {

  /** view_distinct_defi_events_addresses.sql:2-33 — the wallet spine:
    * UNION ALL of sender+account from every event table, outer DISTINCT.
    */
  def distinctAddresses(eventTables: Seq[DataFrame]): DataFrame =
    Relational.unionDistinct("wallet_address",
      eventTables.flatMap(e =>
        Seq(e.select(col("sender_address")), e.select(col("account_address")))))

  /** view_defi_borrow_features.sql:3-9 — per-wallet borrow sums/avg/count. */
  def borrowFeatures(borrow: DataFrame): DataFrame =
    borrow.groupBy("sender_address").agg(
      coalesce(dsum(abs(col("quantity_in_eth"))), lit(0.0)).as("loan_amount_eth_sum"),
      coalesce(davg(abs(col("quantity_in_eth"))), lit(0.0)).as("loan_amount_eth_avg"),
      coalesce(countDistinct(col("transaction_hash")), lit(0L)).as("borrow_total_borrows"))

  /** view_defi_repay_features.sql:3-9. */
  def repayFeatures(repay: DataFrame): DataFrame =
    repay.groupBy("sender_address").agg(
      coalesce(dsum(abs(col("quantity_in_eth"))), lit(0.0)).as("borrow_total_eth_repaid_sum"),
      coalesce(davg(abs(col("quantity_in_eth"))), lit(0.0)).as("borrow_total_eth_repaid_avg"),
      coalesce(countDistinct(col("transaction_hash")), lit(0L)).as("borrow_total_repays"))

  /** view_defi_lending_time_and_count_features.sql:3-9 (deposits). */
  def lendingTimeAndCountFeatures(deposit: DataFrame, asOfEpoch: Long): DataFrame =
    deposit.groupBy("sender_address").agg(
      coalesce(countDistinct(col("transaction_hash")), lit(0L)).as("lending_total_deposits"),
      (lit(asOfEpoch) - min(col("epoch_timestamp"))).as("lending_time_since_first_lending"),
      coalesce(dsum(abs(col("quantity_in_eth"))), lit(0.0)).as("total_deposits_in_eth"))

  /** view_defi_lending_sum_redeems_features.sql:3-7 (withdrawals). */
  def lendingSumRedeemsFeatures(withdraw: DataFrame): DataFrame =
    withdraw.groupBy("sender_address").agg(
      coalesce(dsum(abs(col("quantity_in_eth"))), lit(0.0)).as("lending_sum_redeems"))

  /** view_defi_credit_mix_features.sql:3-58 — distinct-protocol counts per
    * event type on the wallet spine, GREATEST mix.
    */
  def creditMixFeatures(
      spine: DataFrame,
      borrow: DataFrame,
      deposit: DataFrame,
      withdraw: DataFrame,
      repay: DataFrame): DataFrame = {
    def mix(e: DataFrame, name: String) =
      e.groupBy("sender_address")
        .agg(coalesce(countDistinct(col("protocol_name")), lit(0L)).as(name))
    var out = spine
    val parts = Seq(
      mix(borrow, "credit_mix_count_borrow_protocol"),
      mix(deposit, "credit_mix_count_lending_protocol"),
      mix(withdraw, "credit_mix_count_withdraw_protocol"),
      mix(repay, "credit_mix_count_repay_protocol"))
    for (p <- parts)
      out = Relational.leftFeatureJoin(out, p, "wallet_address", "sender_address",
        defaults = Map(p.columns(1) -> lit(0L)), dedup = false)
    out.select(
      col("wallet_address").as("sender_address"),
      col("credit_mix_count_borrow_protocol"),
      col("credit_mix_count_lending_protocol"),
      greatest(
        col("credit_mix_count_borrow_protocol"),
        col("credit_mix_count_lending_protocol"),
        col("credit_mix_count_withdraw_protocol"),
        col("credit_mix_count_repay_protocol")).as("credit_mix_count_protocol"))
  }

  /** view_defi_liquidation_features.sql — per LIQUIDATED ACCOUNT (not
    * sender) liquidation count/sum/time-since-last, 999999999 default on
    * the (never-null) time-since.
    */
  def liquidationFeatures(liquidation: DataFrame, asOfEpoch: Long): DataFrame =
    liquidation.groupBy("account_address").agg(
      coalesce(countDistinct(col("transaction_hash")), lit(0L)).as("liquidation_total_liquidations"),
      coalesce(dsum(abs(col("quantity_in_eth"))), lit(0.0)).as("liquidation_total_amount_eth"),
      coalesce(lit(asOfEpoch) - max(col("epoch_timestamp")), lit(999999999L))
        .as("liquidation_time_since_last_liquidated"))

  /** The shared per-(account, block) health-factor CTE of
    * view_defi_historical_health_and_risk_factor.sql:2-60 (identical copy
    * in view_defi_historical_count_above_threshold.sql:2-60 — computed
    * once here, reused by both callers).
    *
    * NOTE the reference joins borrow to lending on (account, block) only —
    * NOT protocol — so an account borrowing on both protocols at one block
    * duplicates against each lending row. Faithful.
    */
  def accountHealthFactor(mergedPositions: DataFrame): DataFrame = {
    val borrowT = mergedPositions.filter(col("side") === "BORROWER")
      .groupBy("account", "block_number", "protocol")
      .agg(
        dsum(col("balance_in_usd")).as("total_borrow_balance"),
        dsum(col("balance_in_eth")).as("total_borrow_balance_eth"))
      .select(col("account").as("b_account"), col("block_number").as("b_block"),
        col("total_borrow_balance"), col("total_borrow_balance_eth"))
    val lendT = mergedPositions.filter(col("side") === "LENDER" && col("is_collateral") === true)
      .groupBy("account", "block_number", "protocol")
      .agg(
        dsum(col("balance_in_usd") * col("liquidation_threshold")).as("health_factor_numerator"),
        dsum(col("balance_in_eth") * col("liquidation_threshold")).as("misc_available_borrows_eth_collateral"),
        dsum(col("balance_in_eth")).as("misc_total_collateral_eth"))
    lendT
      .join(borrowT,
        borrowT("b_account") === lendT("account") && borrowT("b_block") === lendT("block_number"),
        "left")
      .withColumn("health_factor",
        healthFactor(col("health_factor_numerator"), col("total_borrow_balance")))
      .withColumn("misc_available_borrows_eth",
        coalesce(
          when(col("total_borrow_balance_eth").isNull, col("misc_available_borrows_eth_collateral"))
            .otherwise(col("misc_available_borrows_eth_collateral") - col("total_borrow_balance_eth")),
          lit(0.0)))
      .withColumn("weighted_risk_factor",
        when(col("total_borrow_balance_eth").isNull, lit(0.0))
          .otherwise(col("total_borrow_balance_eth") * (lit(1.0) / col("health_factor"))))
      .select("account", "block_number", "health_factor_numerator",
        "misc_total_collateral_eth", "total_borrow_balance_eth", "health_factor",
        "misc_available_borrows_eth", "weighted_risk_factor", "protocol")
  }

  /** view_defi_historical_health_and_risk_factor.sql:61-191 — per-protocol
    * account+sender-keyed joins UNION-deduped, per-sender risk aggregates,
    * aave/compound FULL OUTER merge, averaged final features.
    */
  def historicalHealthAndRiskFactor(
      borrowEvents: DataFrame,
      accountHf: DataFrame,
      aaveProtocol: String = "aave-v2-eth",
      compoundProtocol: String = "compound-v2-eth"): DataFrame = {
    // The reference joins the RAW borrow-event rows to hf on account only
    // (not block), so every event of an account fans out against every
    // block-day of that account's history before the UNION dedup collapses
    // it again. Since the join output carries nothing from the borrow side
    // but the address columns, pre-deduplicating the borrow side to its
    // distinct (sender, account) pairs / distinct senders is
    // result-identical under the trailing distinct() and turns an
    // |events_per_account| × |blocks_per_account| blow-up into
    // |pairs| × |blocks| — the 100 TB-safe shape.
    val bPairs = borrowEvents.select("sender_address", "account_address").distinct()
    val bSenders = borrowEvents.select("sender_address").distinct()

    def perProtocol(p: String): DataFrame = {
      // LEFT JOIN ... WHERE hf.protocol = p collapses to an inner join
      // against the protocol slice (non-matches have NULL protocol)
      val hfp = accountHf.filter(col("protocol") === p)
        .select(col("account").as("hf_account"), col("block_number").as("block_number_hf"),
          col("health_factor"), col("weighted_risk_factor"),
          col("misc_available_borrows_eth"), col("misc_total_collateral_eth"))
      val outCols = Seq(col("sender_address"), col("block_number_hf"), col("health_factor"),
        col("weighted_risk_factor"), col("misc_available_borrows_eth"),
        col("misc_total_collateral_eth"))
      val viaAccount = bPairs.join(hfp, bPairs("account_address") === hfp("hf_account"), "inner")
        .select(outCols: _*)
      val viaSender = bSenders.join(hfp, bSenders("sender_address") === hfp("hf_account"), "inner")
        .select(outCols: _*)
      viaAccount.union(viaSender).distinct() // reference UNION = dedup; weights matter
        .groupBy("sender_address")
        .agg(
          // davgQ (explicit microunit floor): the decimal cast's
          // half-unit tie bit these very columns at sf0.1 (Scalars.davgQ)
          when(count(lit(1)) === 1, davgQ(col("health_factor")))
            .otherwise(davgQ(when(col("health_factor") =!= 1000000.0, col("health_factor"))))
            .as("avg_health_factor"),
          davgQ(lit(1.0) / col("health_factor")).as("historical_average_risk_factor"),
          davgQ(col("weighted_risk_factor")).as("historical_weighted_avg_risk_factor"),
          min(col("health_factor")).as("historical_min_health_factor"),
          (lit(1.0) / min(col("health_factor"))).as("historical_max_risk_factor"),
          davgQ(col("misc_available_borrows_eth")).as("misc_avg_available_borrows_eth"),
          davgQ(col("misc_total_collateral_eth")).as("misc_avg_total_collateral_eth"))
    }

    // reference merge is COALESCE(compound, aave): compound is the LEFT
    // side of the full outer join (l_ = compound, r_ = aave — matching the
    // reference's c/a aliases), so an asymmetric merge column added later
    // lands on the right protocol
    val merged = Relational.fullOuterCoalesceKey(
      perProtocol(compoundProtocol), perProtocol(aaveProtocol),
      "sender_address", "sender_address")
    def c(side: String, name: String) = coalesce(col(s"${side}_$name"), lit(0.0))
    def avgOfTwo(a: org.apache.spark.sql.Column, cc: org.apache.spark.sql.Column) =
      when(a === 0.0 && cc =!= 0.0, cc)
        .when(cc === 0.0 && a =!= 0.0, a)
        .otherwise((cc + a) / 2)
    merged.select(
      col("sender_address"),
      coalesce(greatest(c("l", "historical_max_risk_factor"), c("r", "historical_max_risk_factor")), lit(0.0))
        .as("historical_max_risk_factor"),
      coalesce(c("l", "misc_avg_total_collateral_eth") + c("r", "misc_avg_total_collateral_eth"), lit(0.0))
        .as("misc_avg_total_collateral_eth"),
      coalesce(c("l", "misc_avg_available_borrows_eth") + c("r", "misc_avg_available_borrows_eth"), lit(0.0))
        .as("misc_avg_available_borrows_eth"),
      avgOfTwo(c("r", "historical_weighted_avg_risk_factor"), c("l", "historical_weighted_avg_risk_factor"))
        .as("historical_weighted_avg_risk_factor"),
      avgOfTwo(c("r", "historical_average_risk_factor"), c("l", "historical_average_risk_factor"))
        .as("historical_average_risk_factor"))
      .distinct()
  }

  /** view_defi_historical_count_above_threshold.sql:61-97 — per-protocol
    * disjunctive (account OR sender) join against hf < 1.2 block-days,
    * COUNT(DISTINCT block), merged across protocols.
    *
    * The reference's OR-join would plan as a BroadcastNestedLoopJoin; here
    * it is the union-of-two-equi-joins rewrite, semantics-preserving under
    * the COUNT(DISTINCT) (SURVEY.md §7.4.4).
    */
  def historicalCountAboveThreshold(
      borrowEvents: DataFrame,
      accountHf: DataFrame,
      aaveProtocol: String = "aave-v2-eth",
      compoundProtocol: String = "compound-v2-eth"): DataFrame = {
    // as in historicalHealthAndRiskFactor: the borrow side contributes only
    // address columns and the aggregate is COUNT(DISTINCT block), so the
    // per-event duplication the reference's join produces is invisible —
    // join from the distinct pairs/senders instead of the raw event rows
    val bPairs = borrowEvents.select("sender_address", "account_address").distinct()
    val bSenders = borrowEvents.select("sender_address").distinct()

    def perProtocol(p: String): DataFrame = {
      val hfp = accountHf.filter(col("protocol") === p && col("health_factor") < 1.2)
        .select(col("account").as("hf_account"), col("block_number").as("hf_block"))
      val m1 = bPairs.join(hfp, bPairs("account_address") === hfp("hf_account"), "inner")
        .select(col("sender_address"), col("hf_block"))
      val m2 = bSenders.join(hfp, bSenders("sender_address") === hfp("hf_account"), "inner")
        .select(col("sender_address"), col("hf_block"))
      m1.union(m2)
        .groupBy("sender_address")
        .agg(coalesce(countDistinct(col("hf_block")), lit(0L)).as("historical_count_above_threshold"))
    }

    // compound on the left, matching the reference's COALESCE(c, a) merge
    val merged = Relational.fullOuterCoalesceKey(
      perProtocol(compoundProtocol), perProtocol(aaveProtocol),
      "sender_address", "sender_address")
    merged.select(
      col("sender_address"),
      coalesce(
        coalesce(col("l_historical_count_above_threshold"), lit(0L)) +
          coalesce(col("r_historical_count_above_threshold"), lit(0L)),
        lit(0L)).as("historical_count_above_threshold"))
      .distinct()
  }

  /** view_defi_current_health_factor_features.sql — latest-market (`>=`
    * argmax) snapshot, per-protocol current positions health factor, LEAST
    * cap, weighted-avg risk. Faithful to the reference's asymmetric
    * coalesces (aave weighted_risk_factor stays NULL when missing) and the
    * unguarded 1/price.
    */
  def currentHealthFactorFeatures(
      stageMarketData: DataFrame,
      currentPositions: DataFrame,
      aaveProtocol: String = "aave-v2-eth",
      compoundProtocol: String = "compound-v2-eth",
      ethMarketNames: Seq[String] = Seq("Aave interest bearing WETH", "Compound Ether")): DataFrame = {
    val latest = Relational.latestPerGroupGeq(stageMarketData, "name", "block_number")
    val currentMd = latest.select(
      col("id").as("md_id"), col("input_token_price_usd"),
      col("decimals"), (col("liquidation_threshold") * 0.01).as("liquidation_threshold"))
    val currentMdByProto = latest.filter(col("name").isin(ethMarketNames: _*))
      .select(col("input_token_price_usd").as("proto_price"), col("protocol").as("proto_protocol"))

    val cmdp = currentPositions
      .join(currentMd, col("market_id") === col("md_id"), "inner")
      .join(currentMdByProto, col("protocol") === col("proto_protocol"), "inner")
      .withColumn("balance_in_usd",
        (col("balance") * col("input_token_price_usd")) / pow(lit(10.0), col("decimals")))
      .withColumn("balance_in_eth", (lit(1.0) / col("proto_price")) * col("balance_in_usd"))

    def protoHf(p: String): DataFrame = {
      val borrowT = cmdp.filter(col("protocol") === p && col("side") === "BORROWER")
        .groupBy("account").agg(
          dsum(col("balance_in_usd")).as("total_borrow_balance"),
          dsum(col("balance_in_eth")).as("total_borrow_balance_eth"))
        .select(col("account").as("b_account"), col("total_borrow_balance"),
          col("total_borrow_balance_eth"))
      val lendT = cmdp.filter(col("protocol") === p && col("side") === "LENDER" &&
          col("is_collateral") === true)
        .groupBy("account").agg(
          dsum(col("balance_in_usd") * col("liquidation_threshold")).as("health_factor_numerator"),
          dsum(col("balance_in_eth") * col("liquidation_threshold")).as("misc_available_borrows_eth_collateral"),
          dsum(col("balance_in_eth")).as("misc_total_collateral_eth"))
      lendT.join(borrowT, col("b_account") === lendT("account"), "left")
        .withColumn("health_factor",
          healthFactor(col("health_factor_numerator"), col("total_borrow_balance")))
        .withColumn("misc_available_borrows_eth",
          when(col("total_borrow_balance_eth").isNull, col("misc_available_borrows_eth_collateral"))
            .otherwise(col("misc_available_borrows_eth_collateral") - col("total_borrow_balance_eth")))
        .withColumn("weighted_risk_factor",
          when(col("total_borrow_balance_eth").isNull, lit(0.0))
            .otherwise(col("total_borrow_balance_eth") * (lit(1.0) / col("health_factor"))))
        .select("account", "health_factor", "weighted_risk_factor",
          "misc_total_collateral_eth", "misc_available_borrows_eth", "total_borrow_balance_eth")
    }

    val a = protoHf(aaveProtocol).select(
      col("account").as("a_account"), col("health_factor").as("a_hf"),
      col("weighted_risk_factor").as("a_wrf"),
      col("misc_total_collateral_eth").as("a_mtce"),
      col("misc_available_borrows_eth").as("a_mabe"),
      col("total_borrow_balance_eth").as("a_tbbe"))
    val cmp = protoHf(compoundProtocol).select(
      col("account").as("c_account"), col("health_factor").as("c_hf"),
      col("weighted_risk_factor").as("c_wrf"),
      col("misc_total_collateral_eth").as("c_mtce"),
      col("misc_available_borrows_eth").as("c_mabe"),
      col("total_borrow_balance_eth").as("c_tbbe"))
    val both = cmp.join(a, col("a_account") === col("c_account"), "full_outer")
      .select(
        coalesce(col("c_account"), col("a_account")).as("account"),
        coalesce(col("a_hf"), lit(1000000.0)).as("health_factor_aave"),
        col("a_wrf").as("weighted_risk_factor_aave"), // reference: no coalesce
        coalesce(col("c_hf"), lit(1000000.0)).as("health_factor_compound"),
        coalesce(col("c_wrf"), lit(0.0)).as("weighted_risk_factor_compound"),
        coalesce(col("a_mtce"), lit(0.0)).as("misc_total_collateral_eth_aave"),
        coalesce(col("c_mtce"), lit(0.0)).as("misc_total_collateral_eth_compound"),
        coalesce(col("a_mabe"), lit(0.0)).as("misc_available_borrows_eth_aave"),
        coalesce(col("c_mabe"), lit(0.0)).as("misc_available_borrows_eth_compound"),
        coalesce(col("a_tbbe"), lit(0.0)).as("total_borrow_balance_eth_aave"),
        coalesce(col("c_tbbe"), lit(0.0)).as("total_borrow_balance_eth_compound"))

    val leastHf = least(col("health_factor_compound"), col("health_factor_aave"))
    val cappedHf = when(leastHf > 1000000.0, lit(1000000.0)).otherwise(leastHf)
    val transformed = both.select(
      col("account"),
      cappedHf.as("current_health_factor"),
      (col("misc_total_collateral_eth_compound") + col("misc_total_collateral_eth_aave"))
        .as("total_collateral_eth"),
      (col("misc_available_borrows_eth_compound") + col("misc_available_borrows_eth_aave"))
        .as("available_borrows_eth"),
      (col("weighted_risk_factor_compound") + col("weighted_risk_factor_aave"))
        .as("weighted_risk_factor"),
      (col("total_borrow_balance_eth_compound") + col("total_borrow_balance_eth_aave"))
        .as("total_borrow_balance_eth"),
      (lit(1.0) / leastHf).as("current_risk_factor"),
      when(lit(1.0) / leastHf > 1000000.0, lit(1000000.0))
        .otherwise(lit(1.0) / cappedHf).as("borrow_current_risk_factor_capped"))

    transformed
      .groupBy("account", "current_health_factor", "current_risk_factor",
        "borrow_current_risk_factor_capped")
      .agg(
        dsum(col("total_collateral_eth")).as("misc_total_collateral_eth"),
        dsum(col("available_borrows_eth")).as("misc_available_borrows_eth"),
        dsum(col("weighted_risk_factor")).as("weighted_risk_factor"),
        dsum(col("total_borrow_balance_eth")).as("total_borrow_balance_eth"))
      .withColumn("borrow_weighted_avg_risk_factor",
        coalesce(
          col("weighted_risk_factor") /
            when(col("total_borrow_balance_eth") === 0.0, lit(null)).otherwise(col("total_borrow_balance_eth")),
          lit(0.0)))
      .select("account", "current_health_factor", "misc_total_collateral_eth",
        "misc_available_borrows_eth", "weighted_risk_factor", "total_borrow_balance_eth",
        "borrow_weighted_avg_risk_factor", "current_risk_factor",
        "borrow_current_risk_factor_capped")
  }
}
