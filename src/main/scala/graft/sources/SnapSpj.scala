package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, XXH64}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, FileStatusCache, InMemoryFileIndex, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** STORAGE-PARTITIONED reads of the [[graft.operators.BucketedSnapshots]]
  * versioned table format: a DSv2 catalog that reports the table's
  * hash-bucket layout (`#bucketKey=` column, `#nBuckets=` arity from the
  * manifest header) to the planner as a `bucket(n, key)` transform with
  * [[KeyGroupedPartitioning]], one input partition per bucket carrying
  * its bucket id as the partition key. With
  * `spark.sql.sources.v2.bucketing.enabled`, a join of two maintained
  * tables bucketed on the SAME key at the SAME arity plans with ZERO
  * exchanges — partitions match by bucket-id VALUE, so the co-location
  * is sound whatever hash Spark itself would have used, and a mismatched
  * arity (different `numBuckets`) is simply incompatible and falls back
  * to a normal shuffle plan. This is the storage-partitioned-join role
  * the reference's 256-way `address_partition` scheme
  * (reference: src/pipelines/analytics/ddl/transpose_borrow_events.sql:4)
  * approximates by pruning; here the planner gets real co-location.
  *
  * At 100 TB this is the difference between shuffling BOTH sides of
  * every serve-table ⋈ feature-table join and shuffling NEITHER.
  *
  * Identifiers: `spark.table("graft.`/abs/path##<version>`")` — the path
  * with an explicit pinned version after `##` (immutable dirs, so the
  * relation can never go stale). [[graft.operators.BucketedSnapshots
  * .readSnapshotSPJ]] is the user API: it builds the identifier, reads
  * through this catalog, and folds outstanding delete vectors on top
  * (a broadcast anti-join, which PRESERVES the reported partitioning).
  *
  * The scan itself delegates bytes to Spark's own vectorized parquet
  * machinery ([[ParquetScan]]'s reader factory) — only partition
  * PLANNING is custom: files are grouped per bucket (never split across
  * buckets) and each group implements [[HasPartitionKey]].
  */
class SnapCatalog extends TableCatalog with FunctionCatalog {
  private var catalogName: String = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def loadTable(ident: Identifier): Table = {
    val full = (ident.namespace() :+ ident.name()).mkString(".")
    // optional trailing bucket subset: `path##version##b=3,7,9` — the
    // merge path's existing-side read (only the TOUCHED buckets of the
    // live version, still KeyGroupedPartitioning-reported)
    val (stem, subset) = full.lastIndexOf("##b=") match {
      case i if i >= 0 &&
          full.substring(i + 4).split(",").forall(s => s.nonEmpty && s.forall(_.isDigit)) =>
        (full.substring(0, i),
          Some(full.substring(i + 4).split(",").map(_.toInt).toSet))
      case _ => (full, None)
    }
    val (path, version) = stem.lastIndexOf("##") match {
      case -1 => throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
      case i => (stem.substring(0, i), stem.substring(i + 2).toLong)
    }
    new SnapTable(SparkSession.active, path, version, subset)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = Array.empty

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft snapshot tables are written through BucketedSnapshots, not the catalog")

  override def dropTable(ident: Identifier): Boolean = false

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft snapshot tables are written through BucketedSnapshots, not the catalog")

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name() == "bucket") GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))

  override def functionExists(ident: Identifier): Boolean = ident.name() == "bucket"
}

/** The write-side bucket function, exposed to the planner so both sides
  * of a storage-partitioned join resolve to the SAME canonical transform:
  * `pmod(xxhash64(key), n)` exactly as every commit path computes it.
  * The planner compares transforms by `canonicalName` + `numBuckets`;
  * evaluation only happens on auxiliary paths (partially-clustered
  * distribution), where it must — and does — match the layout's hash.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, key): pmod(xxhash64(key), n) — the graft bucketed-snapshot layout hash"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket(n, key) takes 2 arguments, got ${inputType.fields.length}")
    val keyType = inputType.fields(1).dataType
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.bucket.xxhash64_pmod"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        val h = keyType match {
          case LongType => XXH64.hashLong(input.getLong(1), 42L)
          case IntegerType => XXH64.hashInt(input.getInt(1), 42L)
          case StringType =>
            val s = input.getUTF8String(1)
            XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
          case dt => throw new UnsupportedOperationException(
            s"graft bucket(): unsupported key type ${dt.catalogString}")
        }
        val m = (h % n).toInt
        Integer.valueOf(if (m < 0) m + n else m)
      }
    }
  }
}

private[sources] class SnapTable(
    spark: SparkSession, path: String, version: Long,
    bucketSubset: Option[Set[Int]] = None) extends Table with SupportsRead {
  import graft.operators.BucketedSnapshots

  private[sources] lazy val manifest: Map[Int, Long] = {
    val m = BucketedSnapshots.readManifest(spark, path, version)
    bucketSubset.fold(m)(s => m.filter { case (b, _) => s.contains(b) })
  }
  private lazy val dvs: Map[Int, Seq[Long]] = {
    val d = BucketedSnapshots.readDvs(spark, path, version)
    bucketSubset.fold(d)(s => d.filter { case (b, _) => s.contains(b) })
  }
  private lazy val nBuckets: Option[Int] =
    BucketedSnapshots.readNBuckets(spark, path, version)
  private lazy val bucketKey: Option[String] =
    BucketedSnapshots.readBucketKey(spark, path, version)
  private lazy val tableSchema: StructType =
    BucketedSnapshots.readTableSchema(spark, path, version).getOrElse {
      // pre-header table: one footer-merging pass for the schema
      spark.read.option("mergeSchema", "true")
        .parquet(manifest.toSeq.map { case (b, bv) => s"$path/b=$b/v=$bv" }: _*)
        .schema
    }

  override def name(): String =
    s"graft_snap:$path##$version" +
      bucketSubset.fold("")(s => s"##b=${s.toSeq.sorted.mkString(",")}")
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def partitioning(): Array[Transform] =
    (nBuckets, bucketKey) match {
      case (Some(n), Some(k)) if tableSchema.fieldNames.contains(k) =>
        Array(Expressions.bucket(n, k))
      case _ => Array.empty
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapScanBuilder(spark, path, version, tableSchema, nBuckets, bucketKey,
      manifest, dvs)
}

private[sources] class SnapScanBuilder(
    spark: SparkSession, path: String, version: Long, tableSchema: StructType,
    nBuckets: Option[Int], bucketKey: Option[String], manifest: Map[Int, Long],
    dvs: Map[Int, Seq[Long]])
  extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // filters are handed to the parquet reader for row-group/page pruning
  // but ALL returned as residual — Spark keeps the Filter node, so a
  // predicate the parquet translation can't express still evaluates
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new SnapScan(spark, path, version, tableSchema, required, nBuckets, bucketKey,
      manifest, dvs, pushed)
}

/** One [[FilePartition]] per bucket, labeled with its bucket id — the
  * partition-key VALUE [[KeyGroupedPartitioning]] matches across join
  * sides. Files of one bucket are never split across partitions (a
  * bucket is the co-location unit). `dvFiles` carries the bucket's
  * outstanding delete-vector sidecar files for the READER-LEVEL fold.
  */
private[sources] class KeyedFilePartition(
    val bucket: Int, idx: Int, fileArr: Array[PartitionedFile],
    val dvFiles: Array[PartitionedFile])
  extends FilePartition(idx, fileArr) with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

/** Reader factory with the delete-vector fold PUSHED INTO THE SCAN: a
  * bucket with outstanding sidecars drains its (churn-bounded) delete
  * keys into a hash set, then row-filters the data reader — so the scan
  * node itself emits the folded table and the reported
  * [[KeyGroupedPartitioning]] survives to the join (an anti-join ABOVE
  * the scan would hide the partitioning from the planner's
  * storage-partitioned-join matching, which only looks through
  * Project/Filter). Buckets WITHOUT sidecars keep the fully vectorized
  * columnar path — merge-on-read costs only where churn is outstanding,
  * and compaction returns a bucket to the columnar path.
  */
private[sources] case class DvFoldingReaderFactory(
    dataPlain: PartitionReaderFactory, // exact requested schema (clean buckets)
    dataWide: PartitionReaderFactory, // schema widened with the key (dv buckets)
    dv: PartitionReaderFactory, // sidecar reader: single key column
    keyType: DataType,
    keyOrdinal: Int, // ordinal of the key in the WIDENED read schema
    outWidth: Int, // number of fields the query asked for
    widened: StructType // the widened read schema (out fields [+ key])
) extends PartitionReaderFactory {

  // BatchScanExec requires UNIFORM columnar-ness across partitions, so a
  // scan with ANY outstanding sidecar reads row-based throughout (this
  // factory is only constructed when sidecars exist; a clean table keeps
  // the pure columnar path, and compaction returns a table to it)
  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val kp = partition.asInstanceOf[KeyedFilePartition]
    if (kp.dvFiles.isEmpty) return dataPlain.createReader(partition)
    // drain this bucket's delete keys (bounded by the fold budget ×
    // churn — sidecar-sized, never table-sized)
    val deleted = new java.util.HashSet[Any]()
    val dvReader = dv.createReader(new FilePartition(0, kp.dvFiles))
    try {
      while (dvReader.next()) {
        val r = dvReader.get()
        if (!r.isNullAt(0)) deleted.add(box(r, 0))
      }
    } finally dvReader.close()
    val under = dataWide.createReader(partition)
    val needNarrow = outWidth != widened.length
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        while (under.next()) {
          val r = under.get()
          if (r.isNullAt(keyOrdinal) || !deleted.contains(box(r, keyOrdinal))) {
            current = if (needNarrow) narrow(r) else r
            return true
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = under.close()
    }
  }

  /** Boxed, OWNED key value for set membership (readers reuse buffers —
    * UTF8String must be copied before it outlives next()).
    */
  private def box(r: InternalRow, i: Int): Any = keyType match {
    case LongType => java.lang.Long.valueOf(r.getLong(i))
    case IntegerType => java.lang.Integer.valueOf(r.getInt(i))
    case StringType => r.getUTF8String(i).copy()
    case dt => r.get(i, dt)
  }

  /** Drop the internally widened trailing key column. */
  private def narrow(r: InternalRow): InternalRow = {
    val vals = new Array[Any](outWidth)
    var i = 0
    while (i < outWidth) {
      vals(i) = if (r.isNullAt(i)) null else r.get(i, widenedTypes(i))
      i += 1
    }
    new GenericInternalRow(vals)
  }

  @transient private lazy val widenedTypes: Array[DataType] =
    widened.fields.map(_.dataType)
}

private[sources] class SnapScan(
    spark: SparkSession, path: String, version: Long, tableSchema: StructType,
    required: StructType, nBuckets: Option[Int], bucketKey: Option[String],
    manifest: Map[Int, Long], dvs: Map[Int, Seq[Long]], pushed: Array[Filter])
  extends Scan with Batch with SupportsReportPartitioning {

  private val keyFieldOpt: Option[StructField] =
    bucketKey.flatMap(k => tableSchema.fields.find(_.name == k))
  if (dvs.nonEmpty)
    require(keyFieldOpt.isDefined,
      s"table at $path v=$version has outstanding delete vectors but no " +
        "#bucketKey header — read it through BucketedSnapshots.readSnapshot")

  /** The read schema handed to parquet: when sidecars are outstanding and
    * the query pruned the key away, the key is read anyway (the fold
    * needs it) and dropped again before rows leave the reader.
    */
  private lazy val widened: StructType = keyFieldOpt match {
    case Some(kf) if dvs.nonEmpty && !required.fieldNames.contains(kf.name) =>
      required.add(kf)
    case _ => required
  }

  /** Bytes go through Spark's own vectorized parquet reader: real
    * [[ParquetScan]]s built over the manifest's dirs supply the fully
    * configured reader factories; only partition PLANNING (bucket
    * grouping + partition keys) and the sidecar fold are ours.
    */
  private def parquetScanOver(
      dirs: Seq[org.apache.hadoop.fs.Path], data: StructType,
      read: StructType, filters: Array[Filter]): ParquetScan = {
    val index = new InMemoryFileIndex(
      spark, dirs, Map.empty[String, String], Some(data),
      FileStatusCache.getOrCreate(spark), None, None)
    ParquetScan(spark, spark.sessionState.newHadoopConf(), index,
      data, read, StructType(Nil), filters,
      CaseInsensitiveStringMap.empty(), None, Nil, Nil)
  }

  private lazy val dataDirs = manifest.toSeq.sortBy(_._1)
    .map { case (b, bv) => new org.apache.hadoop.fs.Path(s"$path/b=$b/v=$bv") }

  private lazy val partitions: Array[InputPartition] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def list(dir: org.apache.hadoop.fs.Path): Array[PartitionedFile] =
      fs.listStatus(dir).toSeq
        .filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        .map { st =>
          PartitionedFile(InternalRow.empty,
            org.apache.spark.paths.SparkPath.fromPath(st.getPath),
            0L, st.getLen, Array.empty[String],
            st.getModificationTime, st.getLen,
            Map.empty[String, Any])
        }.toArray
    manifest.toSeq.sortBy(_._1).zipWithIndex.map { case ((b, bv), idx) =>
      val files = list(new org.apache.hadoop.fs.Path(s"$path/b=$b/v=$bv"))
      val dvFiles = dvs.getOrElse(b, Nil).toArray.flatMap(j =>
        list(new org.apache.hadoop.fs.Path(s"$path/b=$b/dv=$j")))
      new KeyedFilePartition(b, idx, files, dvFiles): InputPartition
    }.toArray
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = partitions

  override def createReaderFactory(): PartitionReaderFactory = {
    val plain = parquetScanOver(dataDirs, tableSchema, required, pushed)
      .createReaderFactory()
    if (dvs.isEmpty) plain
    else {
      val kf = keyFieldOpt.get
      val wide = parquetScanOver(dataDirs, tableSchema, widened, pushed)
        .createReaderFactory()
      val dvDirs = dvs.toSeq.flatMap { case (b, js) =>
        js.map(j => new org.apache.hadoop.fs.Path(s"$path/b=$b/dv=$j")) }
      val dvSchema = StructType(Seq(kf))
      val dvFactory = parquetScanOver(dvDirs, dvSchema, dvSchema, Array.empty)
        .createReaderFactory()
      DvFoldingReaderFactory(plain, wide, dvFactory, kf.dataType,
        widened.fieldIndex(kf.name), required.length, widened)
    }
  }

  override def outputPartitioning(): Partitioning =
    (nBuckets, bucketKey) match {
      case (Some(n), Some(k)) if required.fieldNames.contains(k) =>
        new KeyGroupedPartitioning(
          Array(Expressions.bucket(n, k)), partitions.length)
      case _ => new UnknownPartitioning(partitions.length)
    }

  override def description(): String =
    s"graft_snap path=$path v=$version buckets=${manifest.size} " +
      s"dvBuckets=${dvs.size} spj=${nBuckets.isDefined && bucketKey.isDefined}"
}
