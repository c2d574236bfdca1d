package graft

import graft.features.{Assembly, Views}
import org.apache.spark.sql.DataFrame

/** Golden test of the 28-column feature assembly on a tiny hand-computed
  * fixture: one active borrower (w1) with positions, one depositor (w2),
  * a liquidation on w1's account, empty current-market data.
  */
class AssemblySpec extends SparkSpec {
  import spark.implicits._

  private val AsOf = 1000000L

  private def evts(rows: (String, String, String, Double, Long, String, Long)*): DataFrame =
    rows.toDF("sender_address", "account_address", "transaction_hash",
      "quantity_in_eth", "epoch_timestamp", "protocol_name", "block_number")

  private lazy val borrow = evts(
    ("w1", "a1", "t1", 10.0, 1000L, "aave", 5L),
    ("w1", "a1", "t2", -20.0, 2000L, "compound", 6L))
  private lazy val repay = evts(("w1", "a1", "t3", 5.0, 1500L, "aave", 5L))
  private lazy val deposit = evts(("w2", "w1", "t4", 8.0, 100L, "aave", 4L))
  private lazy val withdraw = evts()
  private lazy val liq = evts(("w9", "a1", "t5", 7.0, 3000L, "aave", 7L))

  // a1 at (block 5, aave): collateral 100 usd / 50 eth @ threshold .8,
  // borrow 40 usd / 20 eth -> hf = 80/40 = 2, wrf = 20*(1/2) = 10, mabe = 20
  private lazy val positions = Seq(
    ("a1", 5L, "aave-v2-eth", "LENDER", true, 100.0, 50.0, 0.8),
    ("a1", 5L, "aave-v2-eth", "BORROWER", false, 40.0, 20.0, 0.8))
    .toDF("account", "block_number", "protocol", "side", "is_collateral",
      "balance_in_usd", "balance_in_eth", "liquidation_threshold")

  private lazy val emptyMd = Seq.empty[(String, String, Long, Double, Double, Int, String)]
    .toDF("id", "name", "block_number", "input_token_price_usd",
      "liquidation_threshold", "decimals", "protocol")
  private lazy val emptyPos = Seq.empty[(Double, String, String, Boolean, String, String)]
    .toDF("balance", "market_id", "side", "is_collateral", "account", "protocol")

  private lazy val result: Map[String, Map[String, Any]] = {
    val spine = Views.distinctAddresses(Seq(borrow, deposit, withdraw, liq, repay))
    val ahf = Views.accountHealthFactor(positions)
    val out = Assembly.featureAssembly(
      spine, borrow,
      Views.repayFeatures(repay),
      Views.borrowFeatures(borrow),
      Views.creditMixFeatures(spine, borrow, deposit, withdraw, repay),
      Views.lendingSumRedeemsFeatures(withdraw),
      Views.lendingTimeAndCountFeatures(deposit, AsOf),
      Views.historicalHealthAndRiskFactor(borrow, ahf),
      Views.historicalCountAboveThreshold(borrow, ahf),
      Views.liquidationFeatures(liq, AsOf),
      Views.currentHealthFactorFeatures(emptyMd, emptyPos))
    val cols = out.columns
    out.collect().map(r => r.getString(0) -> cols.zip(r.toSeq).toMap).toMap
  }

  test("assembly emits the full feature contract for every spine wallet") {
    assert(result.keySet == Set("w1", "w2", "w9", "a1"))
    // wallet_address + 26 features — the reference's final projection
    // (defi_features_calculation.sql:153-190) has 27 output columns
    assert(result("w1").size == 27)
  }

  test("w1: borrow/repay aggregates, diff, credit mix, liquidation reassignment") {
    val w1 = result("w1")
    assert(w1("borrow_amount_sum_eth") == 30.0) // |10| + |-20|
    assert(w1("borrow_amount_avg_eth") == 15.0)
    assert(w1("borrow_count") == 2L)
    assert(w1("repay_amount_sum_eth") == 5.0)
    assert(w1("repay_count") == 1L)
    assert(w1("borrow_repay_diff_eth") == 25.0)
    assert(w1("unique_borrow_protocol_count") == 2L)
    assert(w1("unique_lending_protocol_count") == 0L)
    // liquidation reassigned from account a1 to sender w1
    assert(w1("liquidation_count") == 1L)
    assert(w1("liquidation_amount_sum_eth") == 7.0)
    assert(w1("time_since_last_liquidated") == AsOf - 3000L)
    // no deposits -> sentinel
    assert(w1("deposit_count") == 0L)
    assert(w1("time_since_first_deposit") == 999999999L)
  }

  test("w1: historical risk factors from the a1 position snapshot (hf = 2)") {
    val w1 = result("w1")
    assert(w1("max_risk_factor") == 0.5) // 1 / min hf
    assert(w1("avg_risk_factor") == 0.5) // avg(1/hf), single row
    assert(w1("avg_weighted_risk_factor") == 10.0) // tbbe * 1/hf = 20 * .5
    assert(w1("total_collateral_avg_eth") == 50.0)
    assert(w1("total_available_borrows_avg_eth") == 20.0) // 40 - 20
    assert(w1("risk_factor_above_threshold_daily_count") == 0L) // hf 2 >= 1.2
    // empty current-market data -> current features all zero
    assert(w1("risk_factor") == 0.0)
    assert(w1("total_collateral_eth") == 0.0)
  }

  test("w2: deposit features with real time-since; zeros elsewhere") {
    val w2 = result("w2")
    assert(w2("deposit_count") == 1L)
    assert(w2("deposit_amount_sum_eth") == 8.0)
    assert(w2("time_since_first_deposit") == AsOf - 100L)
    assert(w2("unique_lending_protocol_count") == 1L)
    assert(w2("borrow_amount_sum_eth") == 0.0)
    assert(w2("withdraw_deposit_diff_if_positive_eth") == 0.0) // clamp(0 - 8)
    assert(w2("time_since_last_liquidated") == 999999999L)
  }

  test("assembly: Local and AtPath boundaries row-identical; AtPath leaves no persisted blocks") {
    import graft.operators.Boundary
    val sf = "/root/testdata/sf0.001"
    graft.sources.Tables.configure(spark)
    def key(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet
    val local = key(graft.registry.FeaturePipeline.assembly(spark, sf, Boundary.Local))
    spark.catalog.clearCache() // scope Local's persists like the harness does
    val stored = key(graft.registry.FeaturePipeline.assembly(spark, sf,
      Boundary.AtPath("target/tmp/assembly_boundary")))
    assert(local == stored, "storage boundary must not change the assembly result")
    assert(local.nonEmpty)
    // the AtPath path unpersisted its intermediates: no cached plans remain
    assert(spark.sharedState.cacheManager.isEmpty,
      "AtPath assembly must leave no block-manager footprint")
  }

  test("assembly passes the reference's data-quality constraint gate") {
    import org.apache.spark.sql.functions.col
    val spine = Views.distinctAddresses(Seq(borrow, deposit, withdraw, liq, repay))
    val ahf = Views.accountHealthFactor(positions)
    val out = Assembly.featureAssembly(
      spine, borrow,
      Views.repayFeatures(repay), Views.borrowFeatures(borrow),
      Views.creditMixFeatures(spine, borrow, deposit, withdraw, repay),
      Views.lendingSumRedeemsFeatures(withdraw),
      Views.lendingTimeAndCountFeatures(deposit, AsOf),
      Views.historicalHealthAndRiskFactor(borrow, ahf),
      Views.historicalCountAboveThreshold(borrow, ahf),
      Views.liquidationFeatures(liq, AsOf),
      Views.currentHealthFactorFeatures(emptyMd, emptyPos))
    graft.quality.Constraints.enforce(out, Seq(
      graft.quality.Constraints.AnyNegative("negative_borrow_count", col("borrow_count")),
      graft.quality.Constraints.AnyNegative("negative_deposit_count", col("deposit_count")),
      graft.quality.Constraints.AnyNull("null_risk_factor", col("risk_factor"))))
  }
}
