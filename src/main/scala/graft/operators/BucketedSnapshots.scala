package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Pointer-committed BUCKETED tables: [[Snapshots]]' atomic-pointer commit
  * composed with [[Incremental.upsertByKeyBucketed]]'s touched-buckets-only
  * layout — the shape a BIG keyed table needs on an object store at 100 TB:
  *
  *   path/_CURRENT                     first line = live table version,
  *                                     rest = retained committed versions
  *   path/manifest/v=N.txt             "bucket,bucketVersion" per line —
  *                                     the table AS OF version N
  *   path/b=K/v=M/part-*.parquet       immutable per-bucket snapshots
  *
  * A commit writes NEW `b=K/v=M+1` dirs for the TOUCHED buckets only,
  * writes the next manifest (touched entries updated, untouched entries
  * copied verbatim — their data dirs are REUSED, never rewritten or even
  * read beyond the merge's own touched set), then atomically replaces
  * `_CURRENT`. So:
  *
  *  - write amplification = touched buckets only (the bucketed layout's
  *    point), yet the commit is ONE atomic small-object flip (the
  *    versioned protocol's point) — no per-bucket rename windows at all,
  *    unlike the rename-swap bucketed table whose crash story needs the
  *    write-ahead manifest + roll-forward;
  *  - a reader pinned at table version N resolves its manifest once and
  *    reads immutable directories — snapshot isolation across ANY number
  *    of concurrent commits within retention;
  *  - time travel = [[readSnapshot]] at any retained version;
  *  - a crash before the pointer flip leaves inert orphan bucket dirs and
  *    possibly an orphan manifest — both invisible (the pointer never
  *    referenced them) and GC'd by later commits.
  *
  * Retention: the newest `keepVersions` committed table versions (count-
  * based — crash orphans never shrink the window); bucket dirs and
  * manifests referenced by NO retained version are deleted after the
  * flip. This is the role an Iceberg/Delta metadata log plays, reduced to
  * one pointer + one manifest per version. Writers are optimistically
  * concurrent: the pointer flip CAS-checks the merge base and a losing
  * racer aborts with [[CommitConflictException]]
  * (see [[Snapshots.commitWith]]'s concurrency note).
  */
object BucketedSnapshots {

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(path: String, v: Long) = s"$path/manifest/v=$v.txt"

  /** (bucket -> bucket version) of a committed table version. */
  private[graft] def readManifest(
      spark: SparkSession, path: String, v: Long): Map[Int, Long] = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(spark, path)
    val in = fs.open(new Path(manifestPath(path, v)))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    txt.split("\n").iterator.map(_.trim).filter(_.nonEmpty).map { line =>
      val Array(b, bv) = line.split(",")
      b.toInt -> bv.toLong
    }.toMap
  }

  /** The pointer, validated against its own manifest (the bucketed layout
    * has no `v=N` data dirs for [[Snapshots.pointerState]] to check).
    */
  private def pointerState(
      spark: SparkSession, path: String): Option[(Long, Seq[Long])] = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(spark, path)
    Snapshots.pointerStateRaw(spark, path)
      .filter { case (v, _) => fs.exists(new Path(manifestPath(path, v))) }
  }

  /** The live table version, if any (same pointer format as [[Snapshots]]). */
  def currentVersion(spark: SparkSession, path: String): Option[Long] =
    pointerState(spark, path).map(_._1)

  /** Retained committed table versions, newest first. */
  def versions(spark: SparkSession, path: String): Seq[Long] =
    pointerState(spark, path).map(_._2.sorted.reverse).getOrElse(Seq.empty)

  /** Read the table exactly as committed at `version` (must be retained). */
  def readSnapshot(spark: SparkSession, path: String, version: Long): DataFrame = {
    val have = versions(spark, path)
    if (!have.contains(version))
      throw new java.io.FileNotFoundException(
        s"bucketed snapshot v=$version at $path is not a retained committed version " +
          s"(retained: ${if (have.isEmpty) "none" else have.mkString(", ")})")
    val m = readManifest(spark, path, version)
    if (m.isEmpty) throw new java.io.FileNotFoundException(
      s"bucketed snapshot v=$version at $path has an empty manifest")
    // mergeSchema: after an evolving commit, untouched buckets still carry
    // the old schema — union-by-name with null backfill on read
    spark.read.option("mergeSchema", "true")
      .parquet(m.toSeq.map { case (b, bv) => s"$path/b=$b/v=$bv" }: _*)
  }

  /** Read the live table. */
  def readCurrent(spark: SparkSession, path: String): DataFrame =
    currentVersion(spark, path) match {
      case Some(v) => readSnapshot(spark, path, v)
      case None =>
        throw new java.io.FileNotFoundException(s"no committed snapshot under $path")
    }

  /** CHANGE DATA FEED between two committed table versions, MANIFEST-
    * PRUNED: only buckets whose `(bucket -> bucketVersion)` manifest entry
    * changed between the versions are read on either side — an untouched
    * bucket's dir is literally the same directory in both versions
    * (commits REUSE untouched dirs), so it provably contributed no change
    * and costs zero bytes. This is what makes an incremental consumer of
    * a 100 TB table cheap: a daily commit touching 1% of buckets yields a
    * feed that reads 2 x 1% of the table, not 2 x 100%.
    *
    * Raw stored rows (for [[applyChanges]] tables that includes the CDC
    * meta columns — tombstoning a key surfaces as U with `_deleted`
    * true); [[readTableChangesBetween]] is the user-level view.
    */
  def readChangesBetween(
      spark: SparkSession, path: String, key: String,
      fromV: Long, toV: Long, updatePreimages: Boolean = false): DataFrame =
    prunedSides(spark, path, fromV, toV) match {
      case (from, to) => Snapshots.diffByKey(from, to, key, updatePreimages)
    }

  /** [[readChangesBetween]] on the TOMBSTONE-FILTERED view of an
    * [[applyChanges]] table: meta columns dropped, a key tombstoned
    * between the versions emits a real 'D' with its pre-delete payload —
    * the Delta-CDF-shaped feed a downstream consumer of the LIVE table
    * wants. Same manifest pruning.
    */
  def readTableChangesBetween(
      spark: SparkSession, path: String, key: String,
      fromV: Long, toV: Long, updatePreimages: Boolean = false): DataFrame =
    prunedSides(spark, path, fromV, toV) match {
      case (from, to) =>
        def live(df: DataFrame) = df.filter(!col(Cdc.DeletedMeta))
          .drop(Cdc.SeqMeta, Cdc.DeletedMeta, Cdc.RankMeta)
        Snapshots.diffByKey(live(from), live(to), key, updatePreimages)
    }

  /** The two version reads restricted to buckets whose manifest entry
    * changed (empty-schema-preserving when NOTHING changed).
    */
  private def prunedSides(
      spark: SparkSession, path: String, fromV: Long, toV: Long): (DataFrame, DataFrame) = {
    require(fromV < toV, s"change feed runs forward: fromV=$fromV, toV=$toV")
    val have = versions(spark, path)
    Seq(fromV, toV).foreach { v =>
      if (!have.contains(v))
        throw new java.io.FileNotFoundException(
          s"bucketed snapshot v=$v at $path is not a retained committed version " +
            s"(retained: ${if (have.isEmpty) "none" else have.mkString(", ")})")
    }
    val mFrom = readManifest(spark, path, fromV)
    val mTo = readManifest(spark, path, toV)
    val touched = (mFrom.keySet ++ mTo.keySet)
      .filter(b => mFrom.get(b) != mTo.get(b)).toSeq.sorted
    def side(m: Map[Int, Long]): DataFrame = {
      val dirs = touched.flatMap(b => m.get(b).map(bv => s"$path/b=$b/v=$bv"))
      if (dirs.nonEmpty) spark.read.option("mergeSchema", "true").parquet(dirs: _*)
      else {
        // nothing changed (or one side has none of the touched buckets):
        // an empty frame with the table's schema
        val any = (m ++ mFrom ++ mTo).headOption.map { case (b, bv) => s"$path/b=$b/v=$bv" }
        any.map(d => spark.read.parquet(d).limit(0)).getOrElse(
          throw new java.io.FileNotFoundException(s"no bucket data under $path"))
      }
    }
    (side(mFrom), side(mTo))
  }

  /** Last-writer-wins keyed upsert; returns the committed table version. */
  def upsertByKey(
      spark: SparkSession,
      updates: DataFrame,
      path: String,
      key: String,
      nBuckets: Int,
      keepVersions: Int = 2): Long =
    mergeCommit(spark, updates, path, key, nBuckets, keepVersions,
      (existing, batch) => Incremental.mergeByKey(existing, batch, key))

  /** Delete-aware CDC apply through the same commit — [[Cdc.applyChanges]]'
    * seq-aware merge rule on the touched buckets, one atomic flip; read the
    * live view with [[readTable]], a pinned one with [[readTableAt]].
    */
  def applyChanges(
      spark: SparkSession,
      changes: DataFrame,
      path: String,
      key: String,
      nBuckets: Int,
      seqCol: String = "seq",
      opCol: String = "op",
      keepVersions: Int = 2): Long =
    mergeCommit(spark, Cdc.reduceBatch(changes, key, seqCol, opCol),
      path, key, nBuckets, keepVersions,
      (existing, batch) => Cdc.mergeSnapshots(existing, batch, key))

  /** Tombstone-filtered live view of an [[applyChanges]] table. */
  def readTable(spark: SparkSession, path: String): DataFrame =
    readCurrent(spark, path).filter(!col(Cdc.DeletedMeta))
      .drop(Cdc.SeqMeta, Cdc.DeletedMeta, Cdc.RankMeta)

  /** Tombstone-filtered view as of table version `version`. */
  def readTableAt(spark: SparkSession, path: String, version: Long): DataFrame =
    readSnapshot(spark, path, version).filter(!col(Cdc.DeletedMeta))
      .drop(Cdc.SeqMeta, Cdc.DeletedMeta, Cdc.RankMeta)

  /** The shared commit: merge the batch into the TOUCHED buckets' current
    * rows, write new per-bucket dirs + the next manifest, flip the
    * pointer, GC. Commit sequence (a crash anywhere leaves a consistent
    * table):
    *   1. resolve pointer + manifest      — crash: nothing happened
    *   2. write b=K/v=M+1 for touched K   — crash: inert orphans
    *   3. write manifest v=N+1            — crash: inert orphan manifest
    *   4. atomically replace _CURRENT     — the commit point
    *   5. GC unreferenced dirs/manifests  — crash: extra dirs, next run GCs
    */
  private[graft] def mergeCommit(
      spark: SparkSession,
      updates: DataFrame,
      path: String,
      key: String,
      nBuckets: Int,
      keepVersions: Int,
      merge: (DataFrame, DataFrame) => DataFrame): Long = {
    import org.apache.hadoop.fs.{FileContext, Options, Path}
    require(nBuckets >= 1, "nBuckets must be >= 1")
    require(keepVersions >= 1, "keepVersions must be >= 1")
    require(!updates.columns.contains("b"),
      "column name 'b' is reserved for the bucket layout — rename the payload column")
    val fs = fsOf(spark, path)
    val bucketOf = pmod(xxhash64(col(key)), lit(nBuckets.toLong)).cast("int")
    val state = pointerState(spark, path)
    val cur = state.map(_._1)
    // CAS base for the pointer flip (raw, see Snapshots.commitWith)
    val casBase = Snapshots.pointerStateRaw(spark, path).map(_._1)
    val curManifest = cur.map(v => readManifest(spark, path, v)).getOrElse(Map.empty)
    // touched buckets: driver-small by construction (<= nBuckets ints)
    // (bucket id hashes the KEY only, so schema evolution never moves rows)
    val touched = updates.select(bucketOf.as("b")).distinct()
      .collect().map(_.getInt(0)).sorted.toIndexedSeq
    // an EMPTY batch touches nothing: committing would write an empty (or
    // verbatim-copied) manifest for no data change — make it a no-op that
    // returns the live version (0 on a never-committed table)
    if (touched.isEmpty) return cur.getOrElse(0L)
    val existingDirs = touched.flatMap(b =>
      curManifest.get(b).map(bv => b -> s"$path/b=$b/v=$bv"))
    val merged =
      if (existingDirs.isEmpty) updates
      else merge(spark.read.option("mergeSchema", "true")
        .parquet(existingDirs.map(_._2): _*), updates)
    val newBucketVersions =
      touched.map(b => b -> nextBucketVersion(spark, path, b)).toMap
    // ONE staging write partitioned by bucket, then per-bucket renames
    // into immutable v-dirs (renames of INVISIBLE dirs — the commit point
    // is still only the pointer flip)
    val staging = new Path(path + "__vstaging")
    if (fs.exists(staging)) fs.delete(staging, true)
    merged.withColumn("b", bucketOf)
      .write.partitionBy("b").mode(SaveMode.Overwrite).parquet(staging.toString)
    touched.foreach { b =>
      val src = new Path(staging, s"b=$b")
      val dstDir = new Path(s"$path/b=$b")
      val dst = new Path(s"$path/b=$b/v=${newBucketVersions(b)}")
      fs.mkdirs(dstDir)
      if (fs.exists(dst)) fs.delete(dst, true) // orphan from a dead run
      if (fs.exists(src)) {
        if (!fs.rename(src, dst))
          throw new java.io.IOException(s"bucketed commit: failed to stage $dst")
      } else {
        // every key of this bucket deduped away in the merge: an EMPTY
        // bucket version — represent as an empty dir with a marker-less
        // parquet write of the merged schema
        merged.limit(0).write.mode(SaveMode.Overwrite).parquet(dst.toString)
      }
    }
    fs.delete(staging, true)
    commitManifest(spark, path, state, casBase, curManifest, newBucketVersions,
      keepVersions)
  }

  /** The shared commit tail: write manifest v=next (current entries
    * overlaid with `newBucketVersions`), CAS-check the pointer, flip it
    * atomically, GC. Returns the committed table version.
    */
  private def commitManifest(
      spark: SparkSession,
      path: String,
      state: Option[(Long, Seq[Long])],
      casBase: Option[Long],
      curManifest: Map[Int, Long],
      newBucketVersions: Map[Int, Long],
      keepVersions: Int): Long = {
    import org.apache.hadoop.fs.{FileContext, Options, Path}
    val fs = fsOf(spark, path)
    val cur = state.map(_._1)
    val next = (cur.toSeq ++ allManifestVersions(spark, path)).foldLeft(0L)(math.max) + 1
    val nextManifest = curManifest ++ newBucketVersions
    val mfTmp = new Path(s"$path/manifest/v=$next.txt.tmp")
    val mf = new Path(manifestPath(path, next))
    fs.mkdirs(new Path(s"$path/manifest"))
    val out = fs.create(mfTmp, true)
    try out.write(nextManifest.toSeq.sorted
      .map { case (b, bv) => s"$b,$bv" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(mfTmp, mf))
      throw new java.io.IOException(s"bucketed commit: failed to write manifest $mf")
    // THE commit point: atomic pointer replace with the retained history.
    // Retention is COUNT-based (newest keepVersions committed versions) —
    // a value window on `next` would let a crash-orphan manifest inflate
    // `next` and evict the still-pinned previous table version.
    val retained = (next +: state.map(_._2).getOrElse(Seq.empty)).distinct
      .sorted.reverse.take(keepVersions)
    Snapshots.checkPointerUnmoved(spark, path, casBase)
    val root = new Path(path)
    val tmp = new Path(root, "_CURRENT.tmp")
    val marker = new Path(root, "_CURRENT")
    val pout = fs.create(tmp, true)
    try pout.write(retained.mkString("\n").getBytes("UTF-8"))
    finally pout.close()
    FileContext.getFileContext(root.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, marker, Options.Rename.OVERWRITE)
    gc(spark, path, retained)
    next
  }

  /** COMPACTION as a table version: rewrite every live bucket dir holding
    * more than `maxFilesPerBucket` data files into ONE file at a fresh
    * bucket version, then commit through the normal manifest + pointer
    * flip — a maintenance commit with NO data change. Daily CDC through
    * [[applyChanges]] leaves each hot bucket version with one part file
    * per staging shuffle partition; left alone, a 100 TB table's read
    * amplification grows with commit count. Properties:
    *
    *  - write cost scales with the FRAGMENTED buckets only; compact
    *    entries for untouched buckets are copied verbatim;
    *  - time-travel-safe: pinned readers of prior versions keep their
    *    immutable dirs (within retention) — CompactionSpec proves the
    *    pre-compaction version byte-stable and the live read equivalent;
    *  - crash-safe and CAS-guarded like any other commit (a crash leaves
    *    inert orphan bucket dirs; a racing writer aborts one side).
    *
    * Runs one small coalesce job per fragmented bucket — bounded by
    * nBuckets, not table size. Returns the committed version (the live
    * version unchanged when nothing is fragmented).
    */
  def compact(
      spark: SparkSession,
      path: String,
      maxFilesPerBucket: Int = 1,
      keepVersions: Int = 2): Long = {
    import org.apache.hadoop.fs.Path
    require(maxFilesPerBucket >= 1, "maxFilesPerBucket must be >= 1")
    require(keepVersions >= 1, "keepVersions must be >= 1")
    val fs = fsOf(spark, path)
    val state = pointerState(spark, path)
    val cur = state.map(_._1).getOrElse(
      throw new java.io.FileNotFoundException(s"no committed snapshot under $path"))
    val casBase = Snapshots.pointerStateRaw(spark, path).map(_._1)
    val curManifest = readManifest(spark, path, cur)
    def dataFiles(b: Int, bv: Long): Int =
      fs.listStatus(new Path(s"$path/b=$b/v=$bv")).count { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    val fragmented = curManifest.toSeq
      .filter { case (b, bv) => dataFiles(b, bv) > maxFilesPerBucket }
      .map(_._1).sorted
    if (fragmented.isEmpty) return cur
    val newBucketVersions = fragmented.map { b =>
      val nv = nextBucketVersion(spark, path, b)
      val dst = new Path(s"$path/b=$b/v=$nv")
      if (fs.exists(dst)) fs.delete(dst, true) // orphan from a dead run
      spark.read.parquet(s"$path/b=$b/v=${curManifest(b)}")
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(dst.toString)
      b -> nv
    }.toMap
    commitManifest(spark, path, state, casBase, curManifest, newBucketVersions,
      keepVersions)
  }

  /** Next version for one bucket: one past the max dir present (orphans
    * from dead runs never get their slot reused).
    */
  private def nextBucketVersion(spark: SparkSession, path: String, b: Int): Long = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(spark, path)
    val base = new Path(s"$path/b=$b")
    val floor =
      if (!fs.exists(base)) 0L
      else fs.listStatus(base).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
        .flatMap(st => st.getPath.getName.stripPrefix("v=").toLongOption)
        .foldLeft(0L)(math.max)
    floor + 1
  }

  private def allManifestVersions(spark: SparkSession, path: String): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(spark, path)
    val dir = new Path(s"$path/manifest")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v=") && n.endsWith(".txt"))
      .flatMap(n => n.stripPrefix("v=").stripSuffix(".txt").toLongOption)
  }

  /** Delete bucket dirs and manifests referenced by NO retained version;
    * orphans (never-committed) age out once below the retention floor —
    * the floor is the OLDEST RETAINED version, never an arithmetic window
    * on the next version number (crash orphans inflate that).
    */
  private def gc(spark: SparkSession, path: String, retained: Seq[Long]): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(spark, path)
    val keepManifests = retained.toSet
    val floor = retained.min
    val live: Set[(Int, Long)] = retained
      .filter(v => fs.exists(new Path(manifestPath(path, v))))
      .flatMap(v => readManifest(spark, path, v).toSeq).toSet
    allManifestVersions(spark, path)
      .filter(v => !keepManifests.contains(v) && v < floor)
      .foreach(v => fs.delete(new Path(manifestPath(path, v)), false))
    val root = new Path(path)
    if (fs.exists(root)) fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("b="))
      .foreach { bdir =>
        val b = bdir.getPath.getName.stripPrefix("b=").toIntOption
        b.foreach { bucket =>
          val liveVs = live.collect { case (`bucket`, bv) => bv }
          val floor = if (liveVs.isEmpty) Long.MaxValue else liveVs.min
          fs.listStatus(bdir.getPath).toSeq
            .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
            .flatMap(st => st.getPath.getName.stripPrefix("v=").toLongOption
              .map(bv => (st.getPath, bv)))
            // unreferenced AND below every retained reference: referenced
            // dirs stay, and orphans ABOVE the floor stay until the
            // retention window passes them (a fallback reader may look)
            .filter { case (_, bv) => !liveVs.contains(bv) && bv < floor }
            .foreach { case (p, _) => fs.delete(p, true) }
        }
      }
  }
}
