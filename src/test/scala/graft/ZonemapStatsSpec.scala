package graft

import graft.operators.{BucketedSnapshots, CommitConflictException}
import org.apache.spark.sql.functions._

/** Manifest zonemap stats + data-skipping reads on the pointer-committed
  * bucketed table, and the disjoint-bucket commit rebase:
  *
  *  - a stats-pruned read returns EXACTLY the filtered full read while
  *    provably skipping buckets (the chosen manifest is asserted smaller,
  *    and exactly the stats-intersecting set);
  *  - all-null buckets are skippable under any range predicate; NULLs
  *    never leak into a range result;
  *  - stat columns are sticky: declared once, maintained on every later
  *    commit and carried verbatim through compaction;
  *  - long/double/decimal columns each round-trip, including fractional
  *    bounds on integral columns (ceil/floor normalization);
  *  - two writers touching DISJOINT buckets both commit (the loser
  *    rebases onto the winner's manifest without re-merging); OVERLAPPING
  *    buckets still abort with [[CommitConflictException]].
  */
class ZonemapStatsSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val path = s"target/tmp/zonemapspec_$name"
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    path
  }

  private def fs(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def bucketOf(k: Long, n: Int): Int =
    Seq(k).toDF("k").select(pmod(xxhash64(col("k")), lit(n.toLong)).cast("int"))
      .head().getInt(0)

  /** Keys 1..200 with v = bucket*1000 + k: every bucket's value range is
    * a disjoint [b*1000, b*1000+200] band, so a band-range predicate must
    * prune every other bucket.
    */
  private def bandedTable(path: String, nBuckets: Int): Long = {
    val rows = (1L to 200L).map { k =>
      val b = bucketOf(k, nBuckets)
      (k, b * 1000L + k, (b * 1000 + k).toDouble / 2.0, BigDecimal(b * 1000 + k))
    }
    BucketedSnapshots.upsertByKey(
      spark, rows.toDF("k", "vl", "vd", "vc"), path, "k", nBuckets,
      statsColumns = Seq("vl", "vd", "vc"))
  }

  test("stats-pruned read: exact result, provably fewer buckets, exactly the intersecting set") {
    val path = fresh("prune")
    val n = 8
    val v1 = bandedTable(path, n)
    val m = BucketedSnapshots.readManifest(spark, path, v1)
    assert(m.size == n)
    // band of bucket 3 only
    val lo = BigDecimal(3000); val hi = BigDecimal(3999)
    val chosen = BucketedSnapshots.pruneBuckets(spark, path, v1, m, "vl", Some(lo), Some(hi))
    assert(chosen.keySet == Set(3), s"only bucket 3's band intersects, got ${chosen.keySet}")
    val got = BucketedSnapshots.readCurrentWhere(spark, path, "vl", Some(lo), Some(hi))
      .select("k", "vl").as[(Long, Long)].collect().toSet
    val want = BucketedSnapshots.readCurrent(spark, path)
      .filter(col("vl") >= lo.toLong && col("vl") <= hi.toLong)
      .select("k", "vl").as[(Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
    // an all-pruned range: empty result, zero buckets read
    val none = BucketedSnapshots.pruneBuckets(
      spark, path, v1, m, "vl", Some(BigDecimal(n * 1000 + 5000)), None)
    assert(none.isEmpty)
    assert(BucketedSnapshots.readCurrentWhere(
      spark, path, "vl", Some(BigDecimal(n * 1000 + 5000)), None).count() == 0)
  }

  test("double and decimal stat columns prune and read exactly; fractional bounds on longs ceil/floor") {
    val path = fresh("types")
    val n = 8
    val v1 = bandedTable(path, n)
    val m = BucketedSnapshots.readManifest(spark, path, v1)
    // vd = (b*1000+k)/2: bucket 5's band is [2500.0, 2600.0]
    val cd = BucketedSnapshots.pruneBuckets(
      spark, path, v1, m, "vd", Some(BigDecimal(2500)), Some(BigDecimal(2601)))
    assert(cd.keySet == Set(5), s"got ${cd.keySet}")
    val gotD = BucketedSnapshots.readCurrentWhere(
      spark, path, "vd", Some(BigDecimal(2500)), Some(BigDecimal(2601)))
      .select("k").as[Long].collect().toSet
    val wantD = BucketedSnapshots.readCurrent(spark, path)
      .filter(col("vd") >= 2500.0 && col("vd") <= 2601.0)
      .select("k").as[Long].collect().toSet
    assert(gotD == wantD && gotD.nonEmpty)
    // decimal column, exact compare
    val cc = BucketedSnapshots.pruneBuckets(
      spark, path, v1, m, "vc", Some(BigDecimal(3000)), Some(BigDecimal(3999)))
    assert(cc.keySet == Set(3))
    val gotC = BucketedSnapshots.readCurrentWhere(
      spark, path, "vc", Some(BigDecimal(3000)), Some(BigDecimal(3999))).count()
    assert(gotC == BucketedSnapshots.readCurrentWhere(
      spark, path, "vl", Some(BigDecimal(3000)), Some(BigDecimal(3999))).count())
    // fractional bounds on a long column: [3000.5, 3002.5] == {3001, 3002}
    val frac = BucketedSnapshots.readCurrentWhere(
      spark, path, "vl", Some(BigDecimal("3000.5")), Some(BigDecimal("3002.5")))
      .select("vl").as[Long].collect().toSet
    val fracWant = BucketedSnapshots.readCurrent(spark, path)
      .filter(col("vl") >= 3001L && col("vl") <= 3002L)
      .select("vl").as[Long].collect().toSet
    assert(frac == fracWant)
  }

  test("all-null buckets are skipped; NULLs never appear in a range result") {
    val path = fresh("nulls")
    val n = 4
    // bucket-0 keys carry NULL w; all others carry w = 1.0
    val rows = (1L to 100L).map { k =>
      val b = bucketOf(k, n)
      (k, if (b == 0) None else Some(1.0))
    }
    val v1 = BucketedSnapshots.upsertByKey(
      spark, rows.toDF("k", "w"), path, "k", n, statsColumns = Seq("w"))
    val m = BucketedSnapshots.readManifest(spark, path, v1)
    val chosen = BucketedSnapshots.pruneBuckets(
      spark, path, v1, m, "w", Some(BigDecimal(0)), None)
    assert(!chosen.keySet.contains(0), "an all-null bucket is skippable under any range")
    val got = BucketedSnapshots.readCurrentWhere(spark, path, "w", Some(BigDecimal(0)), None)
    assert(got.filter(col("w").isNull).count() == 0)
    assert(got.count() == rows.count(_._2.isDefined))
  }

  test("stat columns are sticky across commits and carried through compaction") {
    val path = fresh("sticky")
    val n = 8
    bandedTable(path, n)
    // second commit does NOT re-declare; its touched buckets must still
    // get fresh stats (move key 1's value out of its bucket's old band)
    val b1 = bucketOf(1L, n)
    val v2 = BucketedSnapshots.upsertByKey(
      spark, Seq((1L, 999999L, 0.0, BigDecimal(0))).toDF("k", "vl", "vd", "vc"),
      path, "k", n)
    val m2 = BucketedSnapshots.readManifest(spark, path, v2)
    val hit = BucketedSnapshots.pruneBuckets(
      spark, path, v2, m2, "vl", Some(BigDecimal(999999)), None)
    assert(hit.keySet == Set(b1),
      s"the touched bucket's stats must reflect the NEW max, got ${hit.keySet}")
    val got = BucketedSnapshots.readCurrentWhere(
      spark, path, "vl", Some(BigDecimal(999999)), None)
      .select("k").as[Long].collect().toSet
    assert(got == Set(1L))
    // fragment + compact: stats carry verbatim, pruning and results intact
    val frag = (1L to 200L).filter(k => bucketOf(k, n) == 3)
      .map(k => (k, 3000L + k, (3000 + k) / 2.0, BigDecimal(3000 + k)))
      .toDF("k", "vl", "vd", "vc").repartition(8)
    BucketedSnapshots.upsertByKey(spark, frag, path, "k", n)
    val vc = BucketedSnapshots.compact(spark, path)
    val mc = BucketedSnapshots.readManifest(spark, path, vc)
    val cc = BucketedSnapshots.pruneBuckets(
      spark, path, vc, mc, "vl", Some(BigDecimal(3000)), Some(BigDecimal(3999)))
    // b1's range [~b1*1000, 999999] legitimately spans the band too —
    // zonemaps are conservative; everything else must be pruned
    assert(cc.keySet == Set(3, b1).filter(mc.keySet),
      s"compaction must carry stats, got ${cc.keySet}")
  }

  test("schema evolution: a new stat column prunes new buckets, reads old ones, result exact") {
    val path = fresh("evolve")
    val n = 4
    val first = (1L to 50L).map(k => (k, k)).toDF("k", "vl")
    BucketedSnapshots.upsertByKey(spark, first, path, "k", n, statsColumns = Seq("vl"))
    // evolution: add column `extra`, declare it; only touched buckets get
    // entries for it — untouched (old-schema) buckets must still be READ
    val b7 = bucketOf(7L, n)
    val v2 = BucketedSnapshots.upsertByKey(
      spark, Seq((7L, 7L, 123L)).toDF("k", "vl", "extra"),
      path, "k", n, statsColumns = Seq("extra"))
    val m2 = BucketedSnapshots.readManifest(spark, path, v2)
    val chosen = BucketedSnapshots.pruneBuckets(
      spark, path, v2, m2, "extra", Some(BigDecimal(0)), None)
    // buckets WITHOUT entries for `extra` (the old-schema ones) are
    // conservatively read; b7's entry [123,123] intersects [0, inf)
    assert(chosen.keySet == m2.keySet)
    // a range excluding 123 prunes EXACTLY b7 (the only bucket with stats)
    val excl = BucketedSnapshots.pruneBuckets(
      spark, path, v2, m2, "extra", Some(BigDecimal(200)), None)
    assert(excl.keySet == m2.keySet - b7, s"got ${excl.keySet}")
    val got = BucketedSnapshots.readCurrentWhere(
      spark, path, "extra", Some(BigDecimal(0)), None)
      .select("k", "extra").as[(Long, Long)].collect().toSet
    assert(got == Set((7L, 123L)), "old-schema rows have NULL extra — excluded by the range")
  }

  test("disjoint-bucket writers BOTH commit: the loser rebases, no re-merge, rows and stats intact") {
    val path = fresh("rebase")
    val n = 4
    // two keys in DIFFERENT buckets
    val ka = (1L to 50L).find(k => bucketOf(k, n) == 0).get
    val kb = (1L to 50L).find(k => bucketOf(k, n) == 1).get
    BucketedSnapshots.upsertByKey(
      spark, Seq((ka, 1.0), (kb, 2.0)).toDF("k", "v"), path, "k", n,
      statsColumns = Seq("v"))
    // writer A updates ka (bucket 0); racer B lands kb (bucket 1) between
    // A's merge-base resolve and A's flip — disjoint, so A must REBASE
    val vA = BucketedSnapshots.mergeCommit(
      spark, Seq((ka, 10.0)).toDF("k", "v"), path, "k", n, 2,
      (existing, batch) => {
        BucketedSnapshots.upsertByKey(
          spark, Seq((kb, 20.0)).toDF("k", "v"), path, "k", n)
        graft.operators.Incremental.mergeByKey(existing, batch, "k")
      })
    assert(BucketedSnapshots.currentVersion(spark, path).contains(vA))
    val got = BucketedSnapshots.readCurrent(spark, path)
      .select("k", "v").as[(Long, Double)].collect().toMap
    assert(got == Map(ka -> 10.0, kb -> 20.0),
      "both writers' rows must land — the rebase keeps the winner's buckets")
    // stats reflect BOTH commits (winner's bucket from its commit, ours from ours)
    val m = BucketedSnapshots.readManifest(spark, path, vA)
    val hi = BucketedSnapshots.pruneBuckets(
      spark, path, vA, m, "v", Some(BigDecimal(15)), None)
    assert(hi.keySet == Set(1), s"the winner's stats must survive the rebase, got ${hi.keySet}")
    val lo = BucketedSnapshots.pruneBuckets(
      spark, path, vA, m, "v", Some(BigDecimal(5)), Some(BigDecimal(15)))
    assert(lo.keySet == Set(0), s"the rebased commit's stats must land, got ${lo.keySet}")
  }

  test("point lookup reads ONLY the covering buckets; result equals the filtered full read") {
    val path = fresh("pointlk")
    val n = 8
    bandedTable(path, n)
    val keys = Seq(1L, 2L, 3L)
    val wantBuckets = keys.map(bucketOf(_, n)).toSet
    val got = BucketedSnapshots.readCurrentKeys(spark, path, "k", keys.map(identity[Any]))
    // the scan must touch no file outside the covering buckets
    val touched = got.inputFiles.map { f =>
      f.split("/").find(_.startsWith("b=")).get.stripPrefix("b=").toInt
    }.toSet
    assert(touched == wantBuckets, s"read buckets $touched, keys cover $wantBuckets")
    val gotRows = got.select("k", "vl").as[(Long, Long)].collect().toSet
    val wantRows = BucketedSnapshots.readCurrent(spark, path)
      .filter(col("k").isin(keys: _*)).select("k", "vl").as[(Long, Long)].collect().toSet
    assert(gotRows == wantRows && gotRows.size == 3)
    // a mistyped key list fails loudly instead of hashing differently
    intercept[Exception] {
      BucketedSnapshots.readCurrentKeys(spark, path, "k", Seq("1": Any)).collect()
    }
  }

  test("arity guard: committing with a different nBuckets is rejected; pre-header tables degrade safely") {
    val path = fresh("arity")
    val v1 = BucketedSnapshots.upsertByKey(
      spark, Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), path, "k", nBuckets = 8)
    assert(BucketedSnapshots.readNBuckets(spark, path, v1).contains(8))
    val ex = intercept[IllegalArgumentException] {
      BucketedSnapshots.upsertByKey(
        spark, Seq((3L, 3.0)).toDF("k", "v"), path, "k", nBuckets = 16)
    }
    assert(ex.getMessage.contains("nBuckets=8"))
    // compaction preserves the header without being told the arity
    BucketedSnapshots.upsertByKey(
      spark, (10L to 80L).map(i => (i, i * 1.0)).toDF("k", "v").repartition(8),
      path, "k", nBuckets = 8)
    val vc = BucketedSnapshots.compact(spark, path)
    assert(BucketedSnapshots.readNBuckets(spark, path, vc).contains(8))
    // pre-header manifest: strip the header line — point lookup must
    // degrade to reading every bucket, still exact
    val mf = new org.apache.hadoop.fs.Path(s"$path/manifest/v=$vc.txt")
    val in = fs(path).open(mf)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val out = fs(path).create(mf, true)
    out.write(txt.linesIterator.filterNot(_.startsWith("#")).mkString("\n").getBytes("UTF-8"))
    out.close()
    assert(BucketedSnapshots.readNBuckets(spark, path, vc).isEmpty)
    val got = BucketedSnapshots.readCurrentKeys(spark, path, "k", Seq(10L: Any, 11L: Any))
      .select("k").as[Long].collect().toSet
    assert(got == Set(10L, 11L))
  }

  test("string zonemaps: byte-order-exact pruning, incl. the UTF-16-vs-UTF-8 ordering trap") {
    val path = fresh("strstats")
    val n = 4
    // bucket-banded string values: every bucket's range is its own letter
    // prefix, so a prefix-range predicate must prune every other bucket
    val rows = (1L to 120L).map { k =>
      val b = bucketOf(k, n)
      (k, s"${('a' + b).toChar}-val-$k")
    }
    val v1 = BucketedSnapshots.upsertByKey(
      spark, rows.toDF("k", "s"), path, "k", n, statsColumns = Seq("s"))
    val m = BucketedSnapshots.readManifest(spark, path, v1)
    val chosen = BucketedSnapshots.pruneBucketsString(
      spark, path, v1, m, "s", Some("c"), Some("c\uFFFF"))
    assert(chosen.keySet == Set(2), s"only bucket 2 carries the 'c' prefix, got ${chosen.keySet}")
    val got = BucketedSnapshots.readCurrentWhereString(
      spark, path, "s", Some("c"), Some("c\uFFFF"))
      .select("k", "s").as[(Long, String)].collect().toSet
    val want = BucketedSnapshots.readCurrent(spark, path)
      .filter(col("s") >= "c" && col("s") <= "c\uFFFF")
      .select("k", "s").as[(Long, String)].collect().toSet
    assert(got == want && got.nonEmpty)
    // the ordering trap: U+FFFD sorts BELOW U+10000 in UTF-8 byte order
    // (Spark/parquet binary order) but ABOVE it in Java's UTF-16 order.
    // A Java-String-compare prune would wrongly drop the bucket holding
    // U+10000 for a lower bound of U+FFFD; byte-wise compare keeps it.
    val trap = fresh("strtrap")
    val supp = new String(Character.toChars(0x10000)) // U+10000
    val kSupp = (1L to 50L).find(k => bucketOf(k, 2) == 0).get
    val kBmp = (1L to 50L).find(k => bucketOf(k, 2) == 1).get
    BucketedSnapshots.upsertByKey(
      spark, Seq((kSupp, supp), (kBmp, "A")).toDF("k", "s"), trap, "k", 2,
      statsColumns = Seq("s"))
    val gotTrap = BucketedSnapshots.readCurrentWhereString(
      spark, trap, "s", Some("\uFFFD"), None)
      .select("s").as[String].collect().toSet
    val wantTrap = BucketedSnapshots.readCurrent(spark, trap)
      .filter(col("s") >= "\uFFFD").select("s").as[String].collect().toSet
    assert(gotTrap == wantTrap && gotTrap == Set(supp),
      s"byte-order prune must keep the supplementary-plane row, got $gotTrap")
    // all-null skip and the sticky carry work for strings too
    val v2 = BucketedSnapshots.upsertByKey(
      spark, Seq((1L, "zz-updated")).toDF("k", "s"), path, "k", n)
    val m2 = BucketedSnapshots.readManifest(spark, path, v2)
    val hit = BucketedSnapshots.pruneBucketsString(
      spark, path, v2, m2, "s", Some("zz"), None)
    assert(hit.keySet == Set(bucketOf(1L, n)),
      s"the touched bucket's string stats must reflect the new max, got ${hit.keySet}")
  }

  test("rebucket: arity evolves as a table version; old pins keep the old hash; stats recomputed") {
    val path = fresh("rebucket")
    val all = (1L to 300L).map(i => (i, i)).toDF("k", "vl")
    val v1 = BucketedSnapshots.upsertByKey(
      spark, all, path, "k", nBuckets = 4, statsColumns = Seq("vl"))
    BucketedSnapshots.tag(spark, path, "pre", v1)
    val v2 = BucketedSnapshots.rebucket(spark, path, "k", newNBuckets = 16)
    assert(BucketedSnapshots.readNBuckets(spark, path, v2).contains(16))
    assert(BucketedSnapshots.readNBuckets(spark, path, v1).contains(4),
      "the pinned old version keeps its own arity header")
    // content identical across the rewrite
    val live = BucketedSnapshots.readCurrent(spark, path)
      .select("k", "vl").as[(Long, Long)].collect().toSet
    assert(live == (1L to 300L).map(i => (i, i)).toSet)
    // commits must now pass the NEW arity; the old one is rejected
    intercept[IllegalArgumentException] {
      BucketedSnapshots.upsertByKey(spark, Seq((1L, 0L)).toDF("k", "vl"), path, "k", 4)
    }
    BucketedSnapshots.upsertByKey(spark, Seq((1L, 0L)).toDF("k", "vl"), path, "k", 16)
    // point lookup under the new arity prunes with the new hash...
    val got = BucketedSnapshots.readCurrentKeys(spark, path, "k", Seq(1L: Any, 2L: Any))
      .select("k", "vl").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 2L))
    val touched16 = got.keys.map(bucketOf(_, 16)).toSet
    // ...and the TAGGED pre-rebucket read still hashes with the OLD one
    val pinned = BucketedSnapshots.readSnapshotKeys(spark, path, v1, "k", Seq(1L: Any))
      .select("vl").as[Long].collect().toSet
    assert(pinned == Set(1L), "the pinned version reads its pre-rebucket content")
    // stats were recomputed under the new arity: a range predicate still
    // prunes (vl correlates with k, scattered — at least the empty range)
    assert(BucketedSnapshots.readCurrentWhere(
      spark, path, "vl", Some(BigDecimal(5000)), None).count() == 0)
    val m2 = BucketedSnapshots.readManifest(spark, path,
      BucketedSnapshots.currentVersion(spark, path).get)
    val none = BucketedSnapshots.pruneBuckets(spark, path,
      BucketedSnapshots.currentVersion(spark, path).get, m2, "vl",
      Some(BigDecimal(5000)), None)
    assert(none.isEmpty, "recomputed stats must prune the impossible range to zero buckets")
    assert(touched16.nonEmpty)
  }

  test("overlapping-bucket writers still conflict: the loser aborts, the winner is intact") {
    val path = fresh("overlap")
    val n = 4
    val ka = (1L to 50L).find(k => bucketOf(k, n) == 0).get
    val ka2 = (Range.Long(ka + 1, 200L, 1L)).find(k => bucketOf(k, n) == 0).get
    BucketedSnapshots.upsertByKey(spark, Seq((ka, 1.0)).toDF("k", "v"), path, "k", n)
    val ex = intercept[CommitConflictException] {
      BucketedSnapshots.mergeCommit(
        spark, Seq((ka, 10.0)).toDF("k", "v"), path, "k", n, 2,
        (existing, batch) => {
          // racer writes to the SAME bucket: A's merge inputs are stale
          BucketedSnapshots.upsertByKey(
            spark, Seq((ka2, 20.0)).toDF("k", "v"), path, "k", n)
          graft.operators.Incremental.mergeByKey(existing, batch, "k")
        })
    }
    assert(ex.getMessage.contains("retry"))
    val got = BucketedSnapshots.readCurrent(spark, path)
      .select("k", "v").as[(Long, Double)].collect().toMap
    assert(got == Map(ka -> 1.0, ka2 -> 20.0), "the winner's commit must be intact")
  }

  test("per-file stats: a fragmented bucket's range read scans only the intersecting part files") {
    val path = fresh("perfile")
    // nBuckets=1, value-ordered input repartitioned BY RANGE into 4
    // staged files: each part file covers a disjoint value band
    val rows = (1L to 400L).map(k => (k, k)).toDF("k", "v")
      .repartitionByRange(4, col("v"))
    BucketedSnapshots.upsertByKey(spark, rows, path, "k", 1,
      keepVersions = 3, statsColumns = Seq("v"))
    val dataFiles = fs(path).listStatus(new org.apache.hadoop.fs.Path(
      s"$path/b=0/v=${BucketedSnapshots.readManifest(spark, path,
        BucketedSnapshots.currentVersion(spark, path).get)(0)}"))
      .count { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    assert(dataFiles == 4, s"fixture must stage 4 part files, got $dataFiles")
    // a band inside ONE file's range
    val got = BucketedSnapshots.readCurrentWhere(spark, path, "v",
      Some(BigDecimal(10)), Some(BigDecimal(20)))
    assert(got.select("k").as[Long].collect().toSet == (10L to 20L).toSet)
    val scanned = got.inputFiles.length
    assert(scanned == 1,
      s"a one-band range over a 4-file bucket must scan 1 file, scanned $scanned")
    // a band spanning two files
    val mid = BucketedSnapshots.readCurrentWhere(spark, path, "v",
      Some(BigDecimal(95)), Some(BigDecimal(105)))
    assert(mid.select("k").as[Long].collect().toSet == (95L to 105L).toSet)
    assert(mid.inputFiles.length <= 2, s"got ${mid.inputFiles.length}")
    // compaction folds the bucket to one file and DROPS the stale
    // per-file entries; reads stay exact
    BucketedSnapshots.compact(spark, path, maxFilesPerBucket = 1, keepVersions = 3)
    val after = BucketedSnapshots.readCurrentWhere(spark, path, "v",
      Some(BigDecimal(10)), Some(BigDecimal(20)))
    assert(after.select("k").as[Long].collect().toSet == (10L to 20L).toSet)
    val (_, stats) = BucketedSnapshots.readStats(spark, path,
      BucketedSnapshots.currentVersion(spark, path).get)
    assert(stats(0).forall(_.file.isEmpty),
      "post-compaction entries must be bucket-level only")
  }
}
