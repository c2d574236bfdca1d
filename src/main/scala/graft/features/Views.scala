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

    // r8 single-pass restructure (join distributes over union): the
    // account-keyed and sender-keyed probes union BEFORE one join against
    // the two-protocol hf slice — the result multiset is identical to the
    // reference's 4 separate joins (2 probes × 2 protocols), but the plan
    // evaluates accountHf once instead of 4× and runs one aggregation pass
    // instead of two groupBys + a full-outer merge. The per-protocol
    // UNION-dedup is preserved exactly: `protocol` rides the distinct key.
    val probes = bPairs.select(col("sender_address"), col("account_address").as("__mk"))
      .unionByName(bSenders.select(col("sender_address"), col("sender_address").as("__mk")))
    val hfBoth = accountHf
      .filter(col("protocol").isin(aaveProtocol, compoundProtocol))
      .select(col("account").as("hf_account"), col("protocol"),
        col("block_number").as("block_number_hf"),
        col("health_factor"), col("weighted_risk_factor"),
        col("misc_available_borrows_eth"), col("misc_total_collateral_eth"))
    val deduped = probes.join(hfBoth, col("__mk") === col("hf_account"), "inner")
      .select(col("sender_address"), col("protocol"), col("block_number_hf"),
        col("health_factor"), col("weighted_risk_factor"),
        col("misc_available_borrows_eth"), col("misc_total_collateral_eth"))
      .distinct() // reference UNION = dedup; weights matter

    // per-protocol aggregates as conditional masks over ONE groupBy pass:
    // avg/min ignore NULLs, so davgQ(when(proto=p, x)) over the mixed
    // group is bit-identical to davgQ(x) over the protocol slice
    def isP(p: String) = col("protocol") === p
    def m(cond: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) = when(cond, v)
    def protoAggs(tag: String, p: String) = Seq(
      count(m(isP(p), lit(1))).as(s"${tag}_n"),
      // davgQ (explicit microunit floor): the decimal cast's half-unit
      // tie bit these very columns at sf0.1 (Scalars.davgQ)
      davgQ(m(isP(p), lit(1.0) / col("health_factor"))).as(s"${tag}_arf"),
      davgQ(m(isP(p), col("weighted_risk_factor"))).as(s"${tag}_wrf"),
      (lit(1.0) / min(m(isP(p), col("health_factor")))).as(s"${tag}_mrf"),
      davgQ(m(isP(p), col("misc_available_borrows_eth"))).as(s"${tag}_mabe"),
      davgQ(m(isP(p), col("misc_total_collateral_eth"))).as(s"${tag}_mtce"))
    val aggs = protoAggs("l", compoundProtocol) ++ protoAggs("r", aaveProtocol)
    val perSender = deduped.groupBy("sender_address").agg(aggs.head, aggs.tail: _*)

    // the reference's full-outer COALESCE(compound, aave) merge, expressed
    // over the masked columns: a side is "absent" exactly when its row
    // count is 0 (its masked aggregates are then NULL, as the outer join's
    // unmatched side would be). l_ = compound, r_ = aave, matching the
    // reference's c/a aliases.
    def c(side: String, name: String) = coalesce(
      m(col(s"${side}_n") > 0, col(s"${side}_$name")), lit(0.0))
    def avgOfTwo(a: org.apache.spark.sql.Column, cc: org.apache.spark.sql.Column) =
      when(a === 0.0 && cc =!= 0.0, cc)
        .when(cc === 0.0 && a =!= 0.0, a)
        .otherwise((cc + a) / 2)
    // no trailing distinct: one row per sender by construction (the
    // reference's DISTINCT guards an Athena CTE it cannot prove unique)
    perSender.select(
      col("sender_address"),
      coalesce(greatest(c("l", "mrf"), c("r", "mrf")), lit(0.0))
        .as("historical_max_risk_factor"),
      coalesce(c("l", "mtce") + c("r", "mtce"), lit(0.0))
        .as("misc_avg_total_collateral_eth"),
      coalesce(c("l", "mabe") + c("r", "mabe"), lit(0.0))
        .as("misc_avg_available_borrows_eth"),
      avgOfTwo(c("r", "wrf"), c("l", "wrf"))
        .as("historical_weighted_avg_risk_factor"),
      avgOfTwo(c("r", "arf"), c("l", "arf"))
        .as("historical_average_risk_factor"))
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

    // r8 single-pass restructure, same shape as
    // [[historicalHealthAndRiskFactor]]: union the two probe sets before
    // ONE join against the two-protocol below-threshold slice (join
    // distributes over union — identical multiset to the reference's 4
    // joins), then per-protocol COUNT(DISTINCT block) as conditional
    // masks in one aggregation pass. countDistinct ignores NULLs, so the
    // masked count equals the per-protocol count, and an absent protocol
    // counts 0 — exactly what the full-outer merge's COALESCE(x, 0)
    // produced. The per-protocol counts stay SEPARATE before summing (a
    // block shared by both protocols must count twice, as the reference's
    // c + a sum does). No trailing distinct: unique per sender by
    // construction.
    val probes = bPairs.select(col("sender_address"), col("account_address").as("__mk"))
      .unionByName(bSenders.select(col("sender_address"), col("sender_address").as("__mk")))
    val hfBoth = accountHf
      .filter(col("protocol").isin(aaveProtocol, compoundProtocol) &&
        col("health_factor") < 1.2)
      .select(col("account").as("hf_account"), col("protocol"),
        col("block_number").as("hf_block"))
    probes.join(hfBoth, col("__mk") === col("hf_account"), "inner")
      .groupBy("sender_address")
      .agg((countDistinct(when(col("protocol") === compoundProtocol, col("hf_block"))) +
        countDistinct(when(col("protocol") === aaveProtocol, col("hf_block"))))
        .as("historical_count_above_threshold"))
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
    // ONE window pass over the derived market-data plan (not the agg+join
    // argmax, which evaluates its input twice — see
    // Relational.latestPerGroupWindow's pick rule): before the r8
    // restructure this view's plan evaluated the market-data pipeline ~8×
    // and the positions join ~4× (52 scans / 77 exchanges / 122 aggregates
    // for 150 output rows — the whole stage table re-scanned per reference
    // at 100 TB). The per-protocol borrow/lend split below is now ONE
    // conditional aggregation pass instead of 4 filtered groupBys.
    val latest = Relational.latestPerGroupWindow(stageMarketData, "name", "block_number")
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

    // Single-pass per-account pivot of the reference's 4 filtered CTEs
    // (aave/compound × borrow/lend): each branch's dsum runs over the
    // when()-masked rows, so branch sums are bit-identical to the
    // filtered-groupBy form (dsum is order-independent decimal
    // accumulation). Lend EXISTENCE is a row count, not a sum-null test —
    // protoHf's left join kept an account iff the lend CTE had ≥1 row,
    // even if every masked value were NULL.
    def lendCond(p: String) = col("protocol") === p &&
      col("side") === "LENDER" && col("is_collateral") === true
    def borCond(p: String) = col("protocol") === p && col("side") === "BORROWER"
    def m(cond: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) = when(cond, v)
    def protoAggs(tag: String, p: String) = Seq(
      count(m(lendCond(p), lit(1))).as(s"${tag}_nlend"),
      dsum(m(lendCond(p), col("balance_in_usd") * col("liquidation_threshold"))).as(s"${tag}_num"),
      dsum(m(lendCond(p), col("balance_in_eth") * col("liquidation_threshold"))).as(s"${tag}_mabe_coll"),
      dsum(m(lendCond(p), col("balance_in_eth"))).as(s"${tag}_mtce"),
      dsum(m(borCond(p), col("balance_in_usd"))).as(s"${tag}_tbb"),
      dsum(m(borCond(p), col("balance_in_eth"))).as(s"${tag}_tbbe"))
    val aggs = protoAggs("a", aaveProtocol) ++ protoAggs("c", compoundProtocol)
    val perAccount = cmdp.groupBy("account").agg(aggs.head, aggs.tail: _*)

    // per-protocol derived columns, NULL-masked to lend existence exactly
    // as the left-join-of-CTEs produced them
    def protoCols(tag: String) = {
      val ex = col(s"${tag}_nlend") > 0
      val hf = healthFactor(col(s"${tag}_num"), col(s"${tag}_tbb"))
      val mabe = when(col(s"${tag}_tbbe").isNull, col(s"${tag}_mabe_coll"))
        .otherwise(col(s"${tag}_mabe_coll") - col(s"${tag}_tbbe"))
      val wrf = when(col(s"${tag}_tbbe").isNull, lit(0.0))
        .otherwise(col(s"${tag}_tbbe") * (lit(1.0) / hf))
      (ex, m(ex, hf), m(ex, wrf), m(ex, col(s"${tag}_mtce")), m(ex, mabe), m(ex, col(s"${tag}_tbbe")))
    }
    val (exA, aHf, aWrf, aMtce, aMabe, aTbbe) = protoCols("a")
    val (exC, cHf, cWrf, cMtce, cMabe, cTbbe) = protoCols("c")
    // the full-outer merge of the two per-protocol CTEs: an account exists
    // iff either protocol's lend CTE carried it
    val both = perAccount
      .filter(exA || exC)
      .select(
        col("account"),
        coalesce(aHf, lit(1000000.0)).as("health_factor_aave"),
        aWrf.as("weighted_risk_factor_aave"), // reference: no coalesce
        coalesce(cHf, lit(1000000.0)).as("health_factor_compound"),
        coalesce(cWrf, lit(0.0)).as("weighted_risk_factor_compound"),
        coalesce(aMtce, lit(0.0)).as("misc_total_collateral_eth_aave"),
        coalesce(cMtce, lit(0.0)).as("misc_total_collateral_eth_compound"),
        coalesce(aMabe, lit(0.0)).as("misc_available_borrows_eth_aave"),
        coalesce(cMabe, lit(0.0)).as("misc_available_borrows_eth_compound"),
        coalesce(aTbbe, lit(0.0)).as("total_borrow_balance_eth_aave"),
        coalesce(cTbbe, lit(0.0)).as("total_borrow_balance_eth_compound"))

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
