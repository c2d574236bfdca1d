package graft

import graft.features.Encoders
import graft.quality.Constraints
import org.apache.spark.sql.functions._

/** Branch semantics of the categorical encoders and the k-anonymity audit
  * that the all-clean registry data never exercises: null labels,
  * singleton categories, null measures, sub-k classes.
  */
class EncodersSpec extends SparkSpec {
  import spark.implicits._

  test("targetEncodeLoo: self is excluded; smoothing shrinks toward the prior") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0),
      ("b", 4L, 100.0)).toDF("cat", "id", "y")
    val out = Encoders.targetEncodeLoo(df, "cat", "y", m = 2L)
      .select("id", "n_cat", "enc_loo", "enc_smooth")
      .collect().map(r => r.getLong(0) -> r).toMap
    // cat a, row y=10: loo = (20+30)/2 = 25; prior = 160/4 = 40
    assert(out(1L).getLong(1) == 3L)
    assert(out(1L).getDouble(2) == 25.0)
    assert(out(1L).getDouble(3) == (50.0 + 2 * 40.0) / 4.0)
    // singleton category: loo undefined, smoothed collapses to the prior
    assert(out(4L).isNullAt(2))
    assert(out(4L).getDouble(3) == (0.0 + 2 * 40.0) / 2.0)
  }

  test("targetEncodeLoo: null label takes the plain category mean; never enters stats") {
    val df = Seq(
      ("a", 1L, java.lang.Double.valueOf(10.0)),
      ("a", 2L, java.lang.Double.valueOf(30.0)),
      ("a", 3L, null.asInstanceOf[java.lang.Double])).toDF("cat", "id", "y")
    val out = Encoders.targetEncodeLoo(df, "cat", "y", m = 0L)
      .select("id", "n_cat", "enc_loo")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(3L).getLong(1) == 2L, "null label must not count")
    assert(out(3L).getDouble(2) == 20.0, "null label gets the full mean (nothing to leave out)")
    assert(out(1L).getDouble(2) == 30.0)
  }

  test("quantileBinEqualFreq: percentile-disc cuts, ties stay in one bin, null -> null bin") {
    // 8 values with a heavy tie at 5: cuts at ceil(8k/4) = positions 2,4,6
    val df = Seq(1L, 2L, 5L, 5L, 5L, 5L, 9L, 10L).map(Tuple1(_)).toDF("u")
      .union(Seq(Tuple1(null.asInstanceOf[java.lang.Long])).toDF("u"))
    val out = Encoders.quantileBinEqualFreq(df, "u", nBins = 4)
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .collect().map(r => (if (r.isNullAt(0)) -1 else r.getInt(0)) -> r.getLong(1)).toMap
    // cum: 1->1, 2->2, 5->6, 9->7, 10->8; cuts c1=2 (cv>=2), c2=5 (cv>=4),
    // c3=5 (cv>=6 is also first reached AT the tie) — duplicate cuts
    // collapse bin 3: {1,2}->1, {5,5,5,5}->2, {9,10}->4, null->null
    assert(out == Map(1 -> 2L, 2 -> 4L, 4 -> 2L, -1 -> 1L))
  }

  test("broadcast guard: past the cardinality bound the stats join degrades to shuffle with identical results") {
    val df = (1L to 200L).map(i => (s"cat${i % 40}", i.toDouble, i)).toDF("c", "y", "id")
    def canonEnc(d: org.apache.spark.sql.DataFrame) =
      d.select("id", "n_cat", "enc_loo", "enc_smooth").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).sortBy(_._1).toSeq
    // 40 categories: bound 5 forces the shuffle path, default broadcasts
    val bEnc = canonEnc(Encoders.targetEncodeLoo(df, "c", "y", m = 10L))
    val sEnc = canonEnc(Encoders.targetEncodeLoo(df, "c", "y", m = 10L, maxBroadcastCats = 5))
    assert(bEnc == sEnc)
    // past the bound the FORCED broadcast hint must be gone — Catalyst's
    // own size-based choice remains free to broadcast a frame it can SEE
    // is small, but a stats-less 100 TB-scale frame would shuffle
    val hinted = Encoders.targetEncodeLoo(df, "c", "y", 10L)
      .queryExecution.analyzed.toString
    val unhinted = Encoders.targetEncodeLoo(df, "c", "y", 10L, maxBroadcastCats = 5)
      .queryExecution.analyzed.toString
    assert(hinted.contains("UnresolvedHint BROADCAST") || hinted.contains("ResolvedHint"),
      s"inside the bound the stats join must carry the broadcast hint:\n$hinted")
    assert(!unhinted.contains("UnresolvedHint BROADCAST") && !unhinted.contains("ResolvedHint"),
      s"past the bound the forced broadcast hint must be dropped:\n$unhinted")
    def canonZ(d: org.apache.spark.sql.DataFrame) =
      d.select("id", "z").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .sortBy(_._1).toSeq
    assert(canonZ(Encoders.standardize(df, "c", "y")) ==
      canonZ(Encoders.standardize(df, "c", "y", maxBroadcastGroups = 5)))
  }

  test("kAnonymityReport: distinct subjects decide the flag, not row counts") {
    val df = Seq(
      ("x", 1L), ("x", 1L), ("x", 1L), ("x", 2L), // 4 rows, 2 subjects
      ("y", 1L), ("y", 2L), ("y", 3L)).toDF("quasi", "subject")
    val out = Constraints.kAnonymityReport(df, Seq("quasi"), "subject", k = 3L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("x") == ((2L, 4L, true)), "many rows but 2 subjects: violating at k=3")
    assert(out("y") == ((3L, 3L, false)))
  }
}
