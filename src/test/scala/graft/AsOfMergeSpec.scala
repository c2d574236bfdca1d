package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.util.Random

/** The native sort-merge as-of join must agree row-for-row with the
  * composed [[AsOfJoin.asOf]] (which the DuckDB oracle family already
  * hash-checks) on every tie-free input, and must plan as ONE custom exec
  * with one exchange per side.
  */
class AsOfMergeSpec extends SparkSpec {
  import spark.implicits._

  private val trades = Seq((1L, "k", 1000L), (2L, "k", 2000L), (3L, "x", 500L))
    .toDF("id", "key", "ts")
  private val prices = Seq(
    ("k", 900L, 9.0), ("k", 990L, 9.9),
    ("k", 1500L, 15.0),
    ("k", 2100L, 21.0))
    .toDF("key", "pts", "price")

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.toString)

  test("asOfMerge is row-identical to asOf on the fixture at every tolerance") {
    for (tol <- Seq(0L, 200L, 500L, 10000L)) {
      val plain = sortedRows(AsOfJoin.asOf(trades, prices, Seq("key"), "ts", "pts", tol, Seq("price")))
      val merged = sortedRows(AsOfJoin.asOfMerge(trades, prices, Seq("key"), "ts", "pts", tol, Seq("price")))
      assert(merged == plain, s"tolerance $tol")
    }
  }

  test("asOfMerge == asOf on randomized tie-free inputs (multi-key, int epochs)") {
    val rnd = new Random(42)
    for (round <- 1 to 3) {
      val l = (1 to 300).map(i =>
        (i.toLong, rnd.nextInt(5), s"g${rnd.nextInt(3)}", rnd.nextInt(1000).toLong))
        .toDF("id", "k1", "k2", "ts")
      // unique (k1, k2, pts): the versioned-value-table contract
      val r = rnd.shuffle((0 until 5).flatMap(k1 => (0 until 3).flatMap(k2 =>
        rnd.shuffle((0 until 1000).toList).take(120).map(ts =>
          (k1, s"g$k2", ts.toLong, rnd.nextDouble())))))
        .toDF("k1", "k2", "pts", "price")
      for (tol <- Seq(0L, 7L, 50L, 2000L)) {
        val plain = sortedRows(AsOfJoin.asOf(l, r, Seq("k1", "k2"), "ts", "pts", tol, Seq("price")))
        val merged = sortedRows(AsOfJoin.asOfMerge(l, r, Seq("k1", "k2"), "ts", "pts", tol, Seq("price")))
        assert(merged == plain, s"round $round tolerance $tol")
      }
    }
  }

  test("asOfMergeSalted == asOfMerge for every salt count (salting is invisible)") {
    val rnd = new Random(7)
    val l = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(4), rnd.nextInt(1000).toLong)).toDF("id", "k1", "ts")
    val r = rnd.shuffle((0 until 4).flatMap(k1 =>
      rnd.shuffle((0 until 1000).toList).take(150).map(ts => (k1, ts.toLong, rnd.nextDouble()))))
      .toDF("k1", "pts", "price")
    for (tol <- Seq(0L, 50L, 2000L); nSalts <- Seq(1, 3, 8)) {
      val plain = sortedRows(AsOfJoin.asOfMerge(l, r, Seq("k1"), "ts", "pts", tol, Seq("price")))
      val salted = sortedRows(AsOfJoin.asOfMergeSalted(l, r, Seq("k1"), "ts", "pts", tol,
        Seq("price"), nSalts = nSalts, saltFrom = "id"))
      assert(salted == plain, s"tolerance $tol nSalts $nSalts")
    }
  }

  test("asOfMergeForward == asOfForward on the fixture; open at now, closed at horizon") {
    for (h <- Seq(99L, 100L, 500L, 600L, 10000L)) {
      val plain = sortedRows(AsOfJoin.asOfForward(trades, prices, Seq("key"), "ts", "pts", h, Seq("price")))
      val merged = sortedRows(AsOfJoin.asOfMergeForward(trades, prices, Seq("key"), "ts", "pts", h, Seq("price")))
      assert(merged == plain, s"horizon $h")
    }
    // a right row AT the observation instant never labels it
    val selfTs = Seq(("k", 1000L, 99.0)).toDF("key", "pts", "price")
    assert(AsOfJoin.asOfMergeForward(trades.filter($"id" === 1), selfTs,
      Seq("key"), "ts", "pts", 600L, Seq("price")).collect().forall(_.isNullAt(3)))
  }

  test("asOfMergeForward == asOfForward on randomized tie-free inputs") {
    val rnd = new Random(7)
    val l = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(5), rnd.nextInt(1000).toLong)).toDF("id", "k1", "ts")
    val r = rnd.shuffle((0 until 5).flatMap(k1 =>
      rnd.shuffle((0 until 1000).toList).take(150).map(ts => (k1, ts.toLong, rnd.nextDouble()))))
      .toDF("k1", "pts", "price")
    for (h <- Seq(3L, 40L, 2000L)) {
      val plain = sortedRows(AsOfJoin.asOfForward(l, r, Seq("k1"), "ts", "pts", h, Seq("price")))
      val merged = sortedRows(AsOfJoin.asOfMergeForward(l, r, Seq("k1"), "ts", "pts", h, Seq("price")))
      assert(merged == plain, s"horizon $h")
    }
  }

  test("asOfMerge: null keys and null timestamps never match") {
    val l = Seq((1L, Option("k"), Option(1000L)), (2L, None, Option(1000L)),
      (3L, Option("k"), None)).toDF("id", "key", "ts")
    val r = Seq((Option("k"), Option(900L), 9.0), (None, Option(950L), 99.0),
      (Option("k"), None, 77.0)).toDF("key", "pts", "price")
    val m = AsOfJoin.asOfMerge(l, r, Seq("key"), "ts", "pts", 10000L, Seq("price"))
      .collect().map(row => row.getLong(0) -> Option(row.get(3))).toMap
    assert(m(1L).contains(9.0)) // the non-null price row matches
    assert(m(2L).isEmpty) // null left key
    assert(m(3L).isEmpty) // null left ts
  }

  test("asOfMerge: empty right side yields all-null carried columns") {
    val r = prices.filter(lit(false))
    val rows = AsOfJoin.asOfMerge(trades, r, Seq("key"), "ts", "pts", 100L, Seq("price")).collect()
    assert(rows.length == 3 && rows.forall(_.isNullAt(3)))
  }

  // pre-execution plan string: AQE hasn't folded exchanges into query
  // stages yet, so `Exchange hashpartitioning` counts are exact
  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("asOfMerge plans ONE custom exec and one exchange per side — no join composition") {
    val df = AsOfJoin.asOfMerge(trades, prices, Seq("key"), "ts", "pts", 200L, Seq("price"))
    val s = planString(df)
    assert("AsOfMergeJoin".r.findAllIn(s).length == 1, s)
    assert("Exchange hashpartitioning".r.findAllIn(s).length == 2, s)
    assert(!s.contains("SortMergeJoin") && !s.contains("BroadcastHashJoin") &&
      !s.contains("HashAggregate"), s)
  }

  test("asOfMerge over same-bucketed tables plans ZERO exchanges — the 100 TB layout") {
    val l = (1 to 400).map(i => (i.toLong, s"k${i % 7}", (i * 13 % 1000).toLong))
      .toDF("id", "key", "ts")
    val r = (0 until 7).flatMap(k => (0 until 50).map(j =>
      (s"k$k", (j * 20).toLong, k + j / 100.0))).toDF("key", "pts", "price")
    graft.sources.Layout.writeBucketed(l, "graft_asof_merge_l", 4, "key", Seq("key", "ts"))
    graft.sources.Layout.writeBucketed(r, "graft_asof_merge_r", 4, "key", Seq("key", "pts"))
    val df = AsOfJoin.asOfMerge(spark.table("graft_asof_merge_l"),
      spark.table("graft_asof_merge_r"), Seq("key"), "ts", "pts", 100L, Seq("price"))
    val s = planString(df)
    assert(!s.contains("Exchange"), s"bucketed as-of merge should not shuffle at all:\n$s")
    assert(sortedRows(df) ==
      sortedRows(AsOfJoin.asOf(l, r, Seq("key"), "ts", "pts", 100L, Seq("price"))))
  }

  test("asOfMerge reuses existing co-partitioning — no extra exchange beyond the repartitions") {
    val lp = trades.repartition(4, col("key"))
    val rp = prices.repartition(4, col("key"))
    val df = AsOfJoin.asOfMerge(lp, rp, Seq("key"), "ts", "pts", 200L, Seq("price"))
    val s = planString(df)
    // the two visible exchanges are the explicit repartitions themselves
    // (REPARTITION_BY_COL); EnsureRequirements adds none for the join
    assert("Exchange hashpartitioning".r.findAllIn(s).length == 2, s)
    assert(!s.contains("ENSURE_REQUIREMENTS"), s)
    assert(sortedRows(df) ==
      sortedRows(AsOfJoin.asOf(trades, prices, Seq("key"), "ts", "pts", 200L, Seq("price"))))
  }
}
