package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-batch lifecycle: watermark reads, bounded catch-up filters,
  * append / full-refresh / keyed-upsert sinks (SURVEY.md §2.1, §2.7).
  *
  * The reference's mechanism is a scalar-subquery high-watermark
  * (`WHERE ts > (SELECT MAX(ts) FROM target)`,
  * stage_tranformation_queries.py:20) with a default resume epoch when the
  * target is empty (utils.py:22), strict `>` so re-runs are idempotent-ish,
  * plus DISTINCT at stage.
  */
object Incremental {

  /** The reference's default resume point for an empty target
    * (src/pipelines/utils.py:22 — 2019-05-07T00:00:00Z).
    */
  val DefaultStartEpoch = 1557187200L

  /** Two-phase watermark read: `COALESCE(MAX(col), default)` on the target.
    * One tiny job (parquet footer stats usually answer MAX without a full
    * scan); the literal then pushes down into the source scan — at 100 TB
    * this prunes whole `year,month` partitions.
    */
  def maxWatermark(target: DataFrame, c: Column, default: Long = 0L): Long = {
    val row = target.agg(max(c)).head()
    if (row.isNullAt(0)) default else row.get(0) match {
      case l: Long => l
      case i: Int => i.toLong
      case t: java.sql.Timestamp => t.getTime / 1000
      case d: Double => d.toLong
      case other => other.toString.toDouble.toLong
    }
  }

  /** First-run probe: the target table, or an empty frame of `schema` when
    * the target does not exist yet — the path-level analog of the
    * reference's exists-then-CTAS-or-INSERT catalog probe
    * (defi_events.py:90-94,137-139). Feeding the empty frame into
    * [[maxWatermark]] bootstraps the first load from the default epoch,
    * which is exactly the hole the reference's NULL scalar-subquery
    * watermark falls into on an empty target (SURVEY §7.4.8).
    */
  def readTargetOrEmpty(spark: SparkSession, path: String, schema: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  }

  /** Strict-`>` watermark filter — the incremental slice. */
  def newerThan(source: DataFrame, c: Column, watermark: Long): DataFrame =
    source.filter(c > watermark)

  /** Bounded catch-up: at most `windowSize` units past the watermark per run
    * (reference MAX_TIMEWINDOW_DAYS=10, raw/defi_events.py:58).
    */
  def boundedCatchUp(source: DataFrame, c: Column, watermark: Long, windowSize: Long): DataFrame =
    source.filter(c > watermark && c <= watermark + windowSize)

  /** Append-sink with partition columns — the raw/stage layer write
    * (reference: df.write partitioned by year,month, raw/defi_events.py:38-45).
    */
  def appendPartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Append).partitionBy(partitionCols: _*).parquet(path)

  /** Full-refresh (CTAS-equivalent) sink — drop + rebuild
    * (reference: save_defi_features_datalake.py:34-53). Spark's overwrite is
    * atomic-enough per directory; no manual S3 prefix delete needed.
    */
  def overwriteTable(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Keyed upsert: merge `updates` into the keyed table at `path` —
    * last-writer-wins per key, preferring the update row. This is the
    * Mongo-upsert equivalent (save_defi_features_features_db.py:28-34)
    * realized as a keyed-overwrite: full-outer on the key, update wins.
    * For a remote KV store, swap the write for `df.foreachPartition` with a
    * bulk-upsert client; the dataflow upstream is identical.
    *
    * Durability contract (single-writer, rename-capable FS): the swap below
    * is two renames, NOT atomic as a pair. A crash between rename(dst, old)
    * and rename(tmp, dst) leaves no live directory at `path`; RECOVERY is
    * manual but mechanical — whichever of `path__staging` (the fully
    * written merge) or `path__old` (the pre-merge table) exists, rename it
    * back to `path`; prefer `__staging` (it already contains the merge).
    * Readers concurrent with the swap window can fail and should retry.
    * On object stores (S3A) rename is a non-atomic O(data) copy, so that
    * window is long — for such targets use a versioned-directory pointer
    * (write `path/v=N+1`, then flip a small `_CURRENT` marker file whose
    * single-object PUT IS atomic) or a table format with a commit protocol
    * (Delta/Iceberg). Local/HDFS bench and test paths use this rename swap.
    */
  /** SCHEMA EVOLUTION for the maintained-table sinks: align two frames to
    * their UNION-BY-NAME schema before a keyed merge — the missing side of
    * an added column is null-backfilled, so adding a column to a 100 TB
    * maintained table is one ordinary commit (old rows read as NULL; the
    * bucketed layouts read mixed-schema dirs back with `mergeSchema`).
    * Shared columns must keep their type (`sameType`, nullability-blind):
    * a retyped column is REJECTED up front — silently coercing it would
    * corrupt every historical row at merge time. Column order: the
    * existing table's order, new columns appended.
    *
    * Note the interaction with row-wise update-wins merges: a batch that
    * OMITS an existing column null-backfills it, so rows the batch updates
    * get NULL there (the update row is the new truth — the same rule as a
    * batch that explicitly sets NULL). Producers evolving a schema should
    * keep sending every live column.
    */
  private[graft] def alignSchemas(
      existing: DataFrame, batch: DataFrame): (DataFrame, DataFrame) = {
    val e = existing.schema.map(f => f.name -> f.dataType).toMap
    val b = batch.schema.map(f => f.name -> f.dataType).toMap
    (e.keySet intersect b.keySet).foreach { c =>
      require(org.apache.spark.sql.types.DataType.equalsStructurally(
        e(c), b(c), ignoreNullability = true),
        s"incompatible schema change on column '$c': table has ${e(c).catalogString}, " +
          s"batch has ${b(c).catalogString} — retyping a maintained column is not supported")
    }
    val cols = existing.columns.toSeq ++ batch.columns.filterNot(e.contains)
    def conform(df: DataFrame, have: Map[String, org.apache.spark.sql.types.DataType]) =
      df.select(cols.map(c =>
        if (have.contains(c)) col(c)
        else lit(null).cast(b.getOrElse(c, e(c))).as(c)): _*)
    (conform(existing, e), conform(batch, b))
  }

  /** Last-writer-wins merge of `updates` into `existing` on `key`:
    * full-outer join, update row preferred, unmatched rows from both kept.
    * Schema-evolving via [[alignSchemas]]. Shared by the upsert sinks here
    * and [[graft.operators.BucketedSnapshots.upsertByKey]].
    */
  private[graft] def mergeByKey(existing0: DataFrame, updates0: DataFrame, key: String): DataFrame = {
    val (existing, updates) = alignSchemas(existing0, updates0)
    val updCols = updates.columns
    val u = updates.select(updCols.map(c => col(c).as(s"u_$c")): _*)
    // Row-wise winner, keyed on UPDATE-ROW PRESENCE (u_key non-null after
    // the full-outer), not column-wise coalesce: an update row that
    // legitimately sets a non-key column to NULL must win with that NULL,
    // not silently retain the stale existing value — the same
    // when(incomingWins) rule as [[graft.operators.Cdc.mergeSnapshots]].
    val incomingWins = col(s"u_$key").isNotNull
    existing
      .join(u, col(key) === col(s"u_$key"), "full_outer")
      .select(updCols.map(c => when(incomingWins, col(s"u_$c")).otherwise(col(c)).as(c)): _*)
  }

  def upsertByKey(spark: SparkSession, updates: DataFrame, path: String, key: String): Unit = {
    import org.apache.hadoop.fs.Path
    val dst = new Path(path)
    // resolve the FS from the path URI so hdfs:///s3a:// targets get the
    // right FileSystem — a java.io.File check would always be false there
    // and silently replace the table with only the update slice.
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (!fs.exists(dst)) updates
      else mergeByKey(spark.read.parquet(path), updates, key)
    swapCommit(spark, merged, path)
  }

  /** Two-phase rename commit shared by the snapshot-rewriting sinks
    * ([[upsertByKey]], [[graft.operators.Cdc.applyChanges]]): the merge
    * reads `path`, so materialize to a staging dir first (Spark can't
    * overwrite its own input), then swap with a backup kept until the new
    * data is in place — a crash mid-swap leaves either the old table or a
    * recoverable `__old` copy, never nothing. Local/HDFS rename contract;
    * object-store targets use the [[upsertByKeyVersioned]] pointer flip.
    */
  private[graft] def swapCommit(spark: SparkSession, merged: DataFrame, path: String): Unit =
    swapCommitWith(spark, merged, path, stageExtra = _ => ())

  /** [[swapCommit]] with a hook that runs AGAINST THE STAGING DIR before
    * the swap — anything it writes there (e.g. an applied-batch manifest)
    * commits ATOMICALLY with the data in the one table rename, which is
    * what makes [[aggStateApplyBatch]]'s replay guard exactly-once (a
    * manifest written after a separate data commit would leave a
    * double-count window on a crash between the two).
    */
  private[graft] def swapCommitWith(
      spark: SparkSession, merged: DataFrame, path: String,
      stageExtra: org.apache.hadoop.fs.Path => Unit): Unit = {
    import org.apache.hadoop.fs.Path
    val dst = new Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + "__staging")
    val old = new Path(path + "__old")
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    stageExtra(tmp)
    if (fs.exists(old)) fs.delete(old, true)
    val hadPrev = fs.exists(dst)
    if (hadPrev && !fs.rename(dst, old))
      throw new java.io.IOException(s"swapCommit: failed to move $dst aside")
    if (!fs.rename(tmp, dst)) {
      if (hadPrev) fs.rename(old, dst) // roll back
      throw new java.io.IOException(s"swapCommit: failed to commit $tmp -> $dst")
    }
    if (hadPrev) fs.delete(old, true)
  }

  /** BUCKET-PRUNED keyed upsert — the 100 TB form of [[upsertByKey]]: the
    * table lives as `nBuckets` hash-bucket subdirectories (`path/b=K`,
    * `K = pmod(xxhash64(key), nBuckets)`) and an upsert merges and
    * REWRITES ONLY the buckets that contain batch keys. [[upsertByKey]]'s
    * parquet swap inherently rewrites the whole table per run; here a
    * daily serve batch touching a few buckets rewrites a few buckets'
    * bytes — the reference's daily Mongo upsert
    * (save_defi_features_features_db.py:28-34) at datalake scale. The
    * bucket id is a pure function of the key, so a merged row always lands
    * back in the bucket it came from, and the untouched buckets are not
    * even READ: one merge job over the touched subdirectories only.
    *
    * Commit: ONE staging write (partitioned by bucket), then the same
    * two-rename swap as [[upsertByKey]] applied per touched bucket. A
    * crash mid-sequence leaves every untouched bucket live and at most one
    * bucket in the recoverable `__old` state (same manual recovery note as
    * upsertByKey, scoped to that bucket). Same single-writer /
    * rename-capable-FS contract as the rest of this family; object-store
    * targets should use [[upsertByKeyVersioned]] semantics per bucket.
    *
    * Read the logical table back with [[readBucketed]].
    */
  def upsertByKeyBucketed(
      spark: SparkSession,
      updates: DataFrame,
      path: String,
      key: String,
      nBuckets: Int): Unit =
    mergeBucketed(spark, updates, path, key, nBuckets,
      (existing, batch) => mergeByKey(existing, batch, key))

  /** The shared touched-buckets-only machinery behind [[upsertByKeyBucketed]]
    * and the CDC snapshot family ([[graft.operators.Cdc.applyChangesBucketed]]):
    * identical layout, manifest, and per-bucket swap — only the keyed merge
    * rule differs (last-writer-wins here, seq-aware there). `merge` sees
    * (existing touched-bucket rows, batch rows) and must return rows whose
    * key's bucket is unchanged (any pure function of the key qualifies).
    */
  private[graft] def mergeBucketed(
      spark: SparkSession,
      updates: DataFrame,
      path: String,
      key: String,
      nBuckets: Int,
      merge: (DataFrame, DataFrame) => DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    require(nBuckets >= 1, "nBuckets must be >= 1")
    require(!updates.columns.contains("b"),
      "column name 'b' is reserved for the bucket layout — rename the payload column")
    val bucketOf = pmod(xxhash64(col(key)), lit(nBuckets.toLong)).cast("int")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a previous run may have died mid-commit: roll its manifest forward
    // BEFORE reading current bucket state, or the merge below would read
    // a half-swapped table (worst case: a bucket sitting in `__old` with
    // no live dir — its unmatched keys would silently vanish)
    recoverBucketed(fs, path)
    // live bucket dirs in ONE listing (replaces per-bucket fs.exists
    // probes — one RPC per bucket on a remote store); `b=K__old` leftovers
    // fail the int parse and are excluded, same as the exact-name probes
    val liveBuckets: Set[Int] =
      if (!fs.exists(root)) Set.empty
      else fs.listStatus(root).iterator.filter(_.isDirectory).flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("b=")) n.stripPrefix("b=").toIntOption else None
      }.toSet
    val staging = new Path(path + "__staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    if (liveBuckets.isEmpty) {
      // FIRST commit (or an empty table): nothing to merge, so the batch
      // stages DIRECTLY and the touched-bucket set falls out of the
      // staging listing — the upstream batch DAG runs exactly once (the
      // staged write), never a second time for bucket discovery
      updates.withColumn("b", bucketOf)
        .write.partitionBy("b").mode(SaveMode.Overwrite).parquet(staging.toString)
      val touched = stagedBucketInts(fs, staging)
      commitStagedBuckets(spark, fs, staging, path, touched)
    } else {
      // touched buckets: driver-small by construction (<= nBuckets ints)
      val touched = updates.select(bucketOf.as("b")).distinct()
        .collect().map(_.getInt(0)).sorted.toIndexedSeq
      val existing = touched.filter(liveBuckets)
      // one merge job: read ONLY the touched buckets' current rows.
      // mergeSchema: after an evolving commit, buckets carry mixed schemas —
      // union-by-name with null backfill is exactly the evolution contract
      val merged =
        if (existing.isEmpty) updates
        else merge(
          spark.read.option("mergeSchema", "true")
            .parquet(existing.map(k => s"$path/b=$k"): _*),
          updates)
      merged.withColumn("b", bucketOf)
        .write.partitionBy("b").mode(SaveMode.Overwrite).parquet(staging.toString)
      commitStagedBuckets(spark, fs, staging, path, touched)
    }
  }

  /** The staged `partitionBy("b")` dirs as sorted bucket ints — one
    * listing, used where the staged write itself defines the touched set.
    */
  private def stagedBucketInts(
      fs: org.apache.hadoop.fs.FileSystem,
      staging: org.apache.hadoop.fs.Path): IndexedSeq[Int] =
    if (!fs.exists(staging)) IndexedSeq.empty
    else fs.listStatus(staging).iterator.filter(_.isDirectory).flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("b=")) n.stripPrefix("b=").toIntOption else None
    }.toIndexedSeq.sorted

  /** Stage `withB` (rows already carrying their `b` bucket column) and
    * commit the listed buckets through the write-ahead-manifest two-rename
    * protocol. `dropMissing = true` additionally DELETES a listed bucket
    * whose staging dir is empty (every row of the bucket was filtered
    * away — the tombstone-prune case); the default keeps it, matching the
    * upsert path where an absent staging bucket means the batch's keys
    * deduped away.
    */
  private[graft] def stageAndCommitBuckets(
      spark: SparkSession,
      withB: DataFrame,
      path: String,
      touched: Seq[Int],
      dropMissing: Boolean = false): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(path + "__staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    withB.write.partitionBy("b").mode(SaveMode.Overwrite).parquet(staging.toString)
    commitStagedBuckets(spark, fs, staging, path, touched, dropMissing)
  }

  /** The commit tail of [[stageAndCommitBuckets]] for callers that staged
    * the data themselves (the first-commit fast path in [[mergeBucketed]]).
    */
  private def commitStagedBuckets(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      staging: org.apache.hadoop.fs.Path,
      path: String,
      touched: Seq[Int],
      dropMissing: Boolean = false): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    // WRITE-AHEAD MANIFEST: batch intent (the touched bucket list) recorded
    // AFTER staging is fully written and BEFORE the first rename — so a
    // crash anywhere in the rename loop leaves both the intent and the
    // complete merged data on disk, and recovery can always roll FORWARD
    // to the state this batch was committing (never a partial mix).
    // Atomic via write-temp-then-rename; cleared only after every bucket
    // landed and staging is gone. Recovery replays commitBucket WITHOUT
    // dropMissing: for a prune that crashed mid-commit the not-yet-dropped
    // buckets keep their (semantically invisible) tombstones — a correct
    // table either way, re-prunable by the next run.
    fs.mkdirs(root)
    val mf = new Path(path, "_MANIFEST")
    val mtmp = new Path(path, "_MANIFEST.tmp")
    val out = fs.create(mtmp, true)
    out.write(touched.mkString("\n").getBytes("UTF-8"))
    out.close()
    if (fs.exists(mf)) fs.delete(mf, false)
    if (!fs.rename(mtmp, mf))
      throw new java.io.IOException(s"stageAndCommitBuckets: failed to write manifest $mf")
    touched.foreach { k =>
      if (dropMissing && !fs.exists(new Path(staging, s"b=$k")))
        fs.delete(new Path(s"$path/b=$k"), true)
      else commitBucket(fs, path, staging, k)
    }
    fs.delete(staging, true)
    fs.delete(mf, false)
  }

  /** The per-bucket two-rename swap: stage `staging/b=k` into `path/b=k`
    * with the previous dir held in `b=k__old` until the new one is in
    * place. No-op if the staging dir for the bucket is absent (all the
    * bucket's update keys deduped away, or — during recovery — the bucket
    * already committed).
    */
  private def commitBucket(
      fs: org.apache.hadoop.fs.FileSystem,
      path: String,
      staging: org.apache.hadoop.fs.Path,
      k: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val dst = new Path(s"$path/b=$k")
    val tmp = new Path(staging, s"b=$k")
    val old = new Path(s"$path/b=${k}__old")
    if (fs.exists(tmp)) {
      // a half-swap leaves dst ABSENT with the previous data in __old;
      // tmp (the merged output) supersedes both, so the stale __old is
      // safe to drop whether dst exists or not
      if (fs.exists(old)) fs.delete(old, true)
      val hadPrev = fs.exists(dst)
      if (hadPrev && !fs.rename(dst, old))
        throw new java.io.IOException(s"upsertByKeyBucketed: failed to move $dst aside")
      if (!fs.rename(tmp, dst)) {
        if (hadPrev) fs.rename(old, dst) // roll back this bucket
        throw new java.io.IOException(s"upsertByKeyBucketed: failed to commit $tmp -> $dst")
      }
      if (hadPrev) fs.delete(old, true)
    } else if (fs.exists(old) && !fs.exists(dst)) {
      // committed-then-crashed window can't produce this (tmp is renamed,
      // not copied), but a manual intervention might: restore the backup
      // rather than leave the bucket invisible
      if (!fs.rename(old, dst))
        throw new java.io.IOException(s"upsertByKeyBucketed: failed to restore $old")
    } else if (fs.exists(old)) {
      fs.delete(old, true) // committed, cleanup interrupted: clear the backup
    }
  }

  /** Roll forward an interrupted [[upsertByKeyBucketed]] commit: if a
    * `_MANIFEST` exists, the previous run died between writing its staging
    * data and clearing the manifest. Every listed bucket is re-driven
    * through the same idempotent per-bucket swap (already-committed
    * buckets no-op; half-swapped buckets complete from staging), then
    * staging and the manifest are cleared — the table converges to the
    * exact post-batch state the dead run was committing. Runs
    * automatically at the start of every upsert; callers can also invoke
    * it directly (e.g. a read path that wants strict freshness).
    */
  def recoverBucketed(fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val mf = new Path(path, "_MANIFEST")
    if (!fs.exists(mf)) return
    val staging = new Path(path + "__staging")
    val in = fs.open(mf)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    txt.split("\n").iterator.map(_.trim).filter(_.nonEmpty).map(_.toInt)
      .foreach(k => commitBucket(fs, path, staging, k))
    fs.delete(staging, true)
    fs.delete(mf, false)
  }

  /** The logical view of an [[upsertByKeyBucketed]] table: all buckets,
    * bucket column dropped. The physical `b=K` partitioning stays available
    * to readers that filter on a key's bucket (partition pruning turns a
    * point lookup into a one-bucket scan).
    */
  def readBucketed(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path).drop("b")

  /** Object-store-safe keyed upsert: versioned snapshot directories plus an
    * atomically-committed pointer file. This is the production path for
    * targets where directory rename is a non-atomic O(data) copy (S3A, GCS):
    *
    *   path/v=1/part-*.parquet        immutable committed snapshots
    *   path/v=2/part-*.parquet
    *   path/_CURRENT                  tiny marker holding the live version
    *
    * Commit = write the full merged snapshot to `v=N+1` (invisible to
    * readers), then replace `_CURRENT` — a single small-object write that is
    * all-or-nothing on object stores and an atomic `FileContext` overwrite-
    * rename on HDFS/POSIX. A crash before the pointer flip leaves `v=N`
    * live and `v=N+1` as inert garbage for the next run to overwrite; there
    * is no window with no live table, unlike [[upsertByKey]]'s rename swap.
    * Readers that race the flip see either version, both complete.
    *
    * If `_CURRENT` is missing or unreadable, [[readCurrent]] falls back to
    * the highest snapshot directory that carries Spark's `_SUCCESS` marker,
    * so even marker loss degrades to the last fully-written snapshot.
    * Snapshots older than `keepVersions` are pruned after commit (kept > 1
    * so a reader that resolved the pointer just before the flip can finish
    * its scan).
    */
  def upsertByKeyVersioned(spark: SparkSession, updates: DataFrame, path: String, key: String,
      keepVersions: Int = 2): Unit =
    // the WRITER trusts only the pointer: merging from a _SUCCESS-complete
    // but never-pointer-committed snapshot would resurrect an upsert the
    // caller saw fail — Snapshots.commitWith implements exactly that
    // contract (and the whole protocol is now shared by every versioned
    // sink — see [[Snapshots]]).
    Snapshots.commitWith(spark, path, {
      case None => updates
      case Some(cur) => mergeByKey(cur, updates, key)
    }, keepVersions)

  /** Serve-boundary schema: storage snake_case -> serve camelCase. The
    * reference renames `wallet_address` -> `walletAddress` when handing the
    * datalake features table to the serving KV store
    * (save_defi_features_features_db.py:57); this is that contract for the
    * whole row, as a single narrow projection (no per-column plan rewrites).
    */
  def toServeSchema(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(c).as(camelCase(c))).toSeq: _*)

  private[operators] def camelCase(s: String): String =
    "_([a-z0-9])".r.replaceAllIn(s, m => m.group(1).toUpperCase)

  /** Read the live snapshot of a [[upsertByKeyVersioned]] table: the
    * `_CURRENT` pointer, else — READ-SIDE RECOVERY ONLY, for a lost or
    * corrupted marker — the highest `_SUCCESS`-complete snapshot. The
    * writer never takes this fallback (see [[upsertByKeyVersioned]]): a
    * reader degrading to the last complete snapshot is safe, a writer
    * merging from one could commit an upsert the caller saw fail.
    */
  def readCurrent(spark: SparkSession, path: String): DataFrame =
    Snapshots.readCurrent(spark, path)

  /** Incremental aggregate-view maintenance: a persisted per-key state
    * table of MERGEABLE partials — `(keys…, _sum decimal(38,6), _cnt,
    * _min, _max)` — folded batch by batch, so a 100 TB-history rollup
    * absorbs today's slice without ever recomputing history (the
    * aggregate-table counterpart of [[Cdc.applyChanges]]; same swap
    * commit). Because decimal sums, counts, and min/max are associative
    * AND commutative, any batch slicing and any arrival order converge to
    * the full-recompute state bit-for-bit — which is what lets
    * [[readAggState]]'s derived `avg` hash-match a from-scratch oracle.
    *
    * Scale shape: each batch partial-aggregates map-side to ≤|keys| rows
    * before one keyed full-outer merge against the state; history rows
    * stream through untouched. NOT idempotent under replay (a re-applied
    * batch double-counts — unlike the seq-guarded [[Cdc]] merge); feed it
    * exactly-once slices (the [[maxWatermark]] read contract) or use
    * [[aggStateApplyBatch]], whose applied-batch manifest commits
    * atomically with the data.
    */
  def aggStateApply(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      keyCols: Seq[String],
      measureCol: String): Unit =
    swapCommit(spark, mergedAggState(spark, batch, path, keyCols, measureCol), path)

  /** The merged-partials frame [[aggStateApply]] / [[aggStateApplyBatch]]
    * commit: the batch's map-side partial aggregation full-outer-merged
    * into the existing state (or the partial alone on bootstrap).
    */
  private def mergedAggState(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      keyCols: Seq[String],
      measureCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val part = batch.groupBy(keyCols.map(col): _*)
      .agg(
        sum(col(measureCol).cast("decimal(38,6)")).as("_sum"),
        count(col(measureCol)).as("_cnt"),
        min(col(measureCol)).as("_min"),
        max(col(measureCol)).as("_max"))
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dst)) part
    else {
      val st = spark.read.parquet(path)
        .select(keyCols.map(col) ++
          Seq(col("_sum").as("_s0"), col("_cnt").as("_c0"),
            col("_min").as("_m0"), col("_max").as("_x0")): _*)
      st.join(part, keyCols, "full_outer")
        .select(keyCols.map(col) ++ Seq(
          (coalesce(col("_s0"), lit(0).cast("decimal(38,6)")) +
            coalesce(col("_sum"), lit(0).cast("decimal(38,6)"))).as("_sum"),
          (coalesce(col("_c0"), lit(0L)) + coalesce(col("_cnt"), lit(0L))).as("_cnt"),
          least(col("_m0"), col("_min")).as("_min"),
          greatest(col("_x0"), col("_max")).as("_max")): _*)
    }
  }

  /** [[aggStateApply]] guarded for AT-LEAST-ONCE delivery (the streaming
    * foreachBatch contract): the applied-batch-id manifest
    * (`_applied.json` INSIDE the table dir) commits atomically with the
    * merged data in swapCommit's one table rename, so a replayed batch id
    * is a detected no-op — there is no crash window where data committed
    * but the manifest didn't. Batch ids must be monotone (Structured
    * Streaming's are). Returns true iff the batch was applied.
    */
  def aggStateApplyBatch(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      keyCols: Seq[String],
      measureCol: String,
      batchId: Long): Boolean = {
    if (readAppliedBatch(spark, path).exists(_ >= batchId)) return false
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    swapCommitWith(spark,
      mergedAggState(spark, batch, path, keyCols, measureCol), path,
      stageDir => {
        val out = fs.create(new org.apache.hadoop.fs.Path(stageDir, "_applied.json"), true)
        try out.write(s"""{"appliedThrough":$batchId}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      })
    true
  }

  private[graft] def readAppliedBatch(spark: SparkSession, path: String): Option[Long] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(s"$path/_applied.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val node =
        try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
        catch {
          case e: Exception => throw new java.io.IOException(
            s"corrupt applied-batch manifest $p (cause: ${e.getMessage})", e)
        } finally in.close()
      val f = node.get("appliedThrough")
      if (f == null || !f.canConvertToLong) throw new java.io.IOException(
        s"corrupt applied-batch manifest $p: ${node.toString.take(200)}")
      Some(f.asLong())
    }
  }

  /** The maintained view over [[aggStateApply]] state: exact sum (decimal
    * cast back to double), count, min, max, and the derived mean.
    */
  def readAggState(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .withColumn("sum", col("_sum").cast("double"))
      .withColumn("cnt", col("_cnt"))
      .withColumn("min", col("_min"))
      .withColumn("max", col("_max"))
      .withColumn("avg", when(col("_cnt") > 0L, col("_sum").cast("double") / col("_cnt")))
      .drop("_sum", "_cnt", "_min", "_max")

}
