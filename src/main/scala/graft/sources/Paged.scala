package graft.sources

import java.io.{BufferedReader, InputStreamReader, ObjectInputStream, ObjectOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.JsonLines
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** In-engine equivalents of the reference's four remote-API extractors, as a
  * DataSource V2 batch source (`spark.read.format("graft-pages")`).
  *
  * The reference pulls data over HTTP in four pagination shapes
  * (reference: src/pipelines/raw/defi_events.py:59-92 — SQL-over-HTTP with
  * LIMIT/OFFSET pages; historical_market_data.py:19-80 — per-block snapshot
  * queries on a thread pool; historical_account_positions.py:54-168 — six
  * aliased skip-queries per request then an `id_gt` keyset loop;
  * src/pipelines/analytics/current_collateral_positions.py:34-136 —
  * `account_in` address-list fetch in chunks of 1000). Those are SERVICE
  * protocols, but their distribution semantics — what can be fetched in
  * parallel, what is inherently sequential, what the server can filter —
  * are engine concerns, and this connector makes them Spark-native:
  *
  *  - '''offset''': one [[InputPartition]] PER PAGE — the planner's version
  *    of the reference's thread pool; 1000 executors fetch 1000 pages
  *    concurrently with no driver loop.
  *  - '''snapshot''': one partition per block number — per-block
  *    point-in-time queries are embarrassingly parallel.
  *  - '''keyset''': ONE partition that follows the cursor chain, because
  *    each request's cursor comes from the previous response — sequential
  *    by protocol, not by implementation choice. The reference's intra-step
  *    parallelism (6 aliased `skip` sub-queries per request) is a payload
  *    batch, preserved as the `alias_idx` column.
  *  - '''bucketed''': the server shards records by `hash(key) % nBuckets`;
  *    an explicit address list (option or a pushed `In`/`EqualTo` filter —
  *    [[SupportsPushDownFilters]]) prunes to the buckets actually covering
  *    the requested keys, chunked ≤ `chunkSize` addresses per partition
  *    like the reference's 1000-address request chunks. Unmatched filters
  *    are all returned as residual, so pushdown can only prune, never
  *    change results.
  *
  * TRANSPORT SEAM: pages are read through a directory of JSONL page files
  * plus a `_pages_manifest.json` (written LAST — its presence is the commit
  * marker, same two-step publish discipline as [[Layout.compact]]). A
  * directory IS the production transport for API dumps landed on object
  * storage (any Hadoop filesystem: file://, hdfs://, s3a://); live HTTP
  * would implement the same fetch behind this seam, and is deliberately not
  * shipped — this build environment has no egress, and an unexercisable
  * HTTP client would be dead code. The `serve*Pages` generators below are
  * the test double of the SERVER (their global sort is the server's
  * ORDER BY, not an engine operator), so the connector's pagination math is
  * verified end-to-end against a DuckDB oracle that recomputes the same
  * pages from the raw table.
  *
  * Decode reuses Spark's own [[org.apache.spark.sql.catalyst.json.JacksonParser]]
  * (via [[JsonLines]]) with the PRUNED schema, so column pruning reaches the
  * JSON decode the way `ReadSchema` pruning reaches a parquet scan.
  */
object Paged {

  val FORMAT = "graft-pages"
  val MANIFEST = "_pages_manifest.json"

  // provenance column the reader injects per mode (dir-name derived, like a
  // parquet partition column)
  val PAGE_COL = "_page"
  val BLOCK_COL = "_block"
  val STEP_COL = "_step"

  private[sources] def pagesDir(root: String) = s"$root/pages"

  private def fs(path: Path, conf: Configuration): FileSystem = path.getFileSystem(conf)

  private def writeManifest(root: String, conf: Configuration, fields: Map[String, Any]): Unit = {
    val m = new java.util.HashMap[String, Any]()
    fields.foreach { case (k, v) =>
      m.put(k, v match {
        case s: Seq[_] => val l = new java.util.ArrayList[Any](); s.foreach(l.add(_)); l
        case other => other
      })
    }
    val p = new Path(root, MANIFEST)
    val out = fs(p, conf).create(p, true)
    try out.write(new ObjectMapper().writeValueAsBytes(m)) finally out.close()
  }

  private[sources] def readManifest(root: String, conf: Configuration): com.fasterxml.jackson.databind.JsonNode = {
    val p = new Path(root, MANIFEST)
    val in = fs(p, conf).open(p)
    try new ObjectMapper().readTree(in) finally in.close()
  }

  private def reset(spark: SparkSession, root: String): Unit = {
    val p = new Path(root)
    fs(p, spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  // ------------------------------------------------------------------
  // server-side fixture generators (the test double of the remote API)
  // ------------------------------------------------------------------

  /** Materialize `df` as LIMIT/OFFSET pages of `pageSize` in `orderCols`
    * order (the server's ORDER BY — the global window here plays the
    * server, it is not an engine pattern). Returns the page count.
    */
  def serveOffsetPages(df: DataFrame, orderCols: Seq[String], pageSize: Int, root: String): Long = {
    require(pageSize > 0)
    val spark = df.sparkSession
    reset(spark, root)
    val rn = row_number().over(Window.orderBy(orderCols.map(col): _*))
    val paged = df.withColumn("pg", ((rn - 1) / pageSize).cast(LongType))
    paged.write.mode(SaveMode.Overwrite).partitionBy("pg").json(pagesDir(root))
    val n = paged.agg(coalesce(max("pg") + 1, lit(0L))).head.getLong(0)
    writeManifest(root, spark.sparkContext.hadoopConfiguration,
      Map("mode" -> "offset", "pageSize" -> pageSize, "pages" -> n))
    n
  }

  /** EXTEND an offset-paged dump: the server's next extraction cycle
    * appends `df` as pages numbered after the existing count, then
    * republishes the manifest (data first, manifest last — a streaming
    * reader's `latestOffset` can never name a half-written page).
    * Returns the new total page count.
    */
  def appendOffsetPages(df: DataFrame, orderCols: Seq[String], pageSize: Int, root: String): Long = {
    require(pageSize > 0)
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val existing = readManifest(root, hconf).get("pages").asLong()
    val rn = row_number().over(Window.orderBy(orderCols.map(col): _*))
    val paged = df.withColumn("pg", (lit(existing) + (rn - 1) / pageSize).cast(LongType))
    paged.write.mode(SaveMode.Append).partitionBy("pg").json(pagesDir(root))
    val n = paged.agg(coalesce(max("pg") + 1, lit(existing))).head.getLong(0)
    writeManifest(root, hconf, Map("mode" -> "offset", "pageSize" -> pageSize, "pages" -> n))
    n
  }

  /** Materialize per-block snapshot pages: `df` must carry `blockCol`; one
    * page directory per distinct block value. Returns the block list.
    */
  def serveSnapshotPages(df: DataFrame, blockCol: String, root: String): Seq[Long] = {
    val spark = df.sparkSession
    reset(spark, root)
    df.withColumn("blk", col(blockCol).cast(LongType)).drop(blockCol)
      .write.mode(SaveMode.Overwrite).partitionBy("blk").json(pagesDir(root))
    val blocks = df.select(col(blockCol).cast(LongType)).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq // bounded: one per snapshot block (day)
    writeManifest(root, spark.sparkContext.hadoopConfiguration,
      Map("mode" -> "snapshot", "blocks" -> blocks))
    blocks
  }

  /** Materialize keyset pages: batches of `batchSize` rows in `idCol`
    * order, each batch addressed by the PREVIOUS batch's max id (`"start"`
    * for the first) — exactly the `id_gt` request chain the reader walks.
    * Each batch also carries `alias_idx` = which of the `nAliases` aliased
    * skip-subqueries of the request would have returned the row.
    */
  def serveKeysetPages(df: DataFrame, idCol: String, batchSize: Int, nAliases: Int, root: String): Long =
    keysetPages(df, idCol, batchSize, nAliases, root, firstCursor = "start", baseSteps = 0L)

  /** EXTEND a keyset chain: the server's next extraction cycle appends rows
    * with ids STRICTLY beyond the chain's last cursor (the keyset
    * protocol's invariant — `id_gt` only ever moves forward), addressed
    * starting from the manifest's `lastCursor`, then republishes the
    * manifest (data first, manifest last — a streaming reader's
    * `latestOffset` can never name a half-written batch). Returns the new
    * total step count.
    */
  def appendKeysetPages(df: DataFrame, idCol: String, batchSize: Int, nAliases: Int, root: String): Long = {
    val man = readManifest(root, df.sparkSession.sparkContext.hadoopConfiguration)
    val lastCursor = man.get("lastCursor").asText()
    if (lastCursor != "start") {
      val minNew = df.agg(min(col(idCol))).head
      require(minNew.isNullAt(0) || minNew.getLong(0) > lastCursor.toLong,
        s"appendKeysetPages: new ids must be > the chain's last cursor $lastCursor " +
          s"(got min ${minNew.get(0)}) — the id_gt protocol only ever moves forward")
    }
    keysetPages(df, idCol, batchSize, nAliases, root,
      firstCursor = lastCursor, baseSteps = man.get("steps").asLong())
  }

  private def keysetPages(df: DataFrame, idCol: String, batchSize: Int, nAliases: Int,
      root: String, firstCursor: String, baseSteps: Long): Long = {
    require(batchSize > 0 && nAliases > 0 && batchSize % nAliases == 0,
      s"batchSize $batchSize must be a positive multiple of nAliases $nAliases")
    val spark = df.sparkSession
    if (baseSteps == 0L && firstCursor == "start") reset(spark, root)
    val aliasSize = batchSize / nAliases
    val rn = row_number().over(Window.orderBy(col(idCol)))
    val stepped = df
      .withColumn("__rn", rn)
      .withColumn("__step", ((col("__rn") - 1) / batchSize).cast(LongType))
      .withColumn("alias_idx", (((col("__rn") - 1) % batchSize) / aliasSize).cast(LongType))
      .drop("__rn")
    // cursor label of step s = max(id) of step s-1 (`firstCursor` for the
    // run's first step); step count is |df|/batchSize — driver-small by
    // construction
    val cursors = stepped.groupBy("__step").agg(max(col(idCol)).as("__mx"))
      .withColumn("cur",
        coalesce(lag(col("__mx"), 1).over(Window.orderBy("__step")).cast("string"), lit(firstCursor)))
      .select("__step", "cur", "__mx")
    // duplicate idCol values straddling a batch boundary would give two
    // consecutive steps the SAME cursor label — their partition dirs would
    // merge and the chain walker would mis-page. Fail loudly instead: the
    // keyset contract requires distinct cursor ids (the reference's id_gt
    // key is a unique primary key).
    val dupCursors = cursors.groupBy("cur").count().filter(col("count") > 1).count()
    require(dupCursors == 0,
      s"serveKeysetPages: duplicate '$idCol' values straddle a batch boundary " +
        "(cursor labels must be strictly increasing; use a unique id column)")
    val paged = stepped.join(broadcast(cursors.select("__step", "cur")), "__step").drop("__step")
    paged.write.mode(if (baseSteps == 0L) SaveMode.Overwrite else SaveMode.Append)
      .partitionBy("cur").json(pagesDir(root))
    val tail = cursors.orderBy(col("__step").desc).limit(1).collect()
    val newSteps = baseSteps + cursors.count()
    val lastCursor = if (tail.isEmpty) firstCursor else tail(0).getAs[Any]("__mx").toString
    writeManifest(root, spark.sparkContext.hadoopConfiguration,
      Map("mode" -> "keyset", "batchSize" -> batchSize, "cursorField" -> idCol,
        "steps" -> newSteps, "lastCursor" -> lastCursor))
    newSteps
  }

  /** Materialize server-sharded pages: records land in
    * `hash(keyCol) % nBuckets` bucket directories — the server-side index
    * that makes an address-filtered fetch read only covering buckets.
    */
  def serveBucketedPages(df: DataFrame, keyCol: String, nBuckets: Int, root: String): Unit = {
    require(nBuckets > 0)
    val spark = df.sparkSession
    reset(spark, root)
    df.withColumn("bkt", pmod(col(keyCol), lit(nBuckets.toLong)))
      .write.mode(SaveMode.Overwrite).partitionBy("bkt").json(pagesDir(root))
    writeManifest(root, spark.sparkContext.hadoopConfiguration,
      Map("mode" -> "bucketed", "nBuckets" -> nBuckets, "cursorField" -> keyCol))
  }
}

/** Hadoop Configuration shipped to executors via its own Writable
  * serialization (the standard connector pattern, self-contained here so
  * the reader resolves file:// and s3a:// the same way the driver does).
  */
final class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = { out.defaultWriteObject(); value.write(out) }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject(); value = new Configuration(false); value.readFields(in)
  }
}

class PagedTableProvider extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = Paged.FORMAT

  private def payloadSchema(options: CaseInsensitiveStringMap): StructType = {
    val ddl = options.get("schema")
    require(ddl != null, "graft-pages requires a 'schema' option (payload DDL); " +
      "schema inference over remote pages would be an extra full fetch (see Formats.readJsonl)")
    StructType.fromDDL(ddl)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val prov = options.getOrDefault("mode", "offset") match {
      case "offset" => Seq(StructField(Paged.PAGE_COL, LongType, nullable = false))
      case "snapshot" => Seq(StructField(Paged.BLOCK_COL, LongType, nullable = false))
      case "keyset" => Seq(StructField(Paged.STEP_COL, LongType, nullable = false))
      case _ => Seq.empty
    }
    StructType(payloadSchema(options).fields ++ prov)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new PagedTable(schema, new CaseInsensitiveStringMap(properties))
}

class PagedTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"${Paged.FORMAT}:${options.get("path")}"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(schema, options)
}

class PagedScanBuilder(tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private val mode = options.getOrDefault("mode", "offset")
  private val cursorField = options.get("cursorField")
  private var required: StructType = tableSchema
  // address list: explicit option (the reference's API shape) intersected
  // with any pushed In/EqualTo on the key — None = full scan of all buckets
  private var addresses: Option[Set[Long]] = Option(options.get("addresses"))
    .map(_.split(",").iterator.filter(_.nonEmpty).map(_.trim.toLong).toSet)
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    if (mode == "bucketed" && cursorField != null) {
      val acc = ArrayBuffer.empty[Filter]
      filters.foreach {
        case f @ In(att, vs) if att == cursorField && vs.forall(_.isInstanceOf[Number]) =>
          val s = vs.iterator.map(_.asInstanceOf[Number].longValue()).toSet
          addresses = Some(addresses.fold(s)(_ intersect s)); acc += f
        case f @ EqualTo(att, v: Number) if att == cursorField =>
          val s = Set(v.longValue())
          addresses = Some(addresses.fold(s)(_ intersect s)); acc += f
        case _ =>
      }
      accepted = acc.toArray
    }
    // every filter stays residual: bucket pruning is a superset read and the
    // exact per-address post-filter below is belt-and-braces — Spark
    // re-evaluating can only agree, never diverge
    filters
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = {
    // the readers fetch the cursor/address key with getLong: a schema DDL
    // declaring it as anything but BIGINT must fail HERE, at planning time,
    // with a clear message — not as a ClassCastException on an executor
    if (cursorField != null) {
      tableSchema.fields.find(_.name == cursorField).foreach { f =>
        require(f.dataType == LongType,
          s"graft-pages: cursorField '$cursorField' must be declared BIGINT in the " +
            s"schema DDL (got ${f.dataType.catalogString}) — cursor/address keys are read as longs")
      }
    }
    // the address list is an EXTERNALLY-SUPPLIED SMALL parameter by
    // contract (the reference's API takes an explicit address_list and
    // chunks it 1000/request) — it lives on the driver and in every task's
    // partition spec, so an unbounded list must fail fast here, not OOM an
    // executor later. Raise via option("maxAddresses", n) if a genuinely
    // larger externally-given list is intended.
    val maxAddresses = options.getOrDefault("maxAddresses", "100000").toInt
    addresses.foreach { a =>
      require(a.size <= maxAddresses,
        s"graft-pages: address list has ${a.size} keys, above the $maxAddresses cap — " +
          "the bucketed mode's contract is an externally-supplied SMALL key list " +
          "(the reference passes an explicit address_list parameter); for a " +
          "corpus-sized key set use a join against the full scan instead")
    }
    new PagedScan(required, mode, options.get("path"), cursorField,
      options.getOrDefault("chunkSize", "1000").toInt, addresses,
      options.getOrDefault("startCursor", "start"))
  }
}

/** One planned page/block/chain/bucket-chunk fetch. `maxSteps` bounds the
  * chain walk (a streaming micro-batch drains exactly the steps between two
  * offsets); `stepBase` keeps `_step` numbering global across micro-batches.
  */
sealed trait PagedPartition extends InputPartition
final case class DirPartition(dir: String, prov: Option[(String, Long)],
    addrFilter: Option[Set[Long]]) extends PagedPartition
final case class KeysetPartition(root: String, startCursor: String,
    maxSteps: Long = Long.MaxValue, stepBase: Long = 0L) extends PagedPartition

class PagedScan(required: StructType, mode: String, path: String, cursorField: String,
    chunkSize: Int, addresses: Option[Set[Long]],
    startCursor: String = "start") extends Scan with Batch {
  require(path != null, "graft-pages requires a 'path' option")

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"${Paged.FORMAT} mode=$mode path=$path"

  /** Streaming forms — the reference's always-on extraction loops as
    * Structured Streaming micro-batch sources:
    *
    *  - '''offset''': the page counter IS the offset; each trigger drains
    *    exactly the pages the server published since the last checkpointed
    *    counter.
    *  - '''keyset''': the chain cursor IS the offset (the reference's
    *    positions drain persists its last `id_gt` id and resumes from it —
    *    raw/historical_account_positions.py:175-184): the offset carries
    *    (steps, cursor), `latestOffset` reads the manifest's published
    *    step count, and a micro-batch walks the chain from the start
    *    offset's cursor for exactly `end.steps - start.steps` batches —
    *    sequential WITHIN a trigger by protocol, with `_step` numbering
    *    global across triggers via `stepBase`.
    *
    * Pages/batches are immutable once the manifest names them (manifest is
    * written LAST), so restart/replay is exactly-once by construction in
    * both modes. Snapshot/bucketed modes are batch-only (their progress
    * notions — block list, address set — are query inputs, not monotone
    * stream offsets).
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = mode match {
    case "offset" => new PagedMicroBatchStream(path, required)
    case "keyset" =>
      require(cursorField != null, "graft-pages keyset streaming requires 'cursorField'")
      new PagedKeysetMicroBatchStream(path, required, cursorField, startCursor)
    case other => throw new IllegalArgumentException(
      s"graft-pages streaming requires mode=offset or mode=keyset (got '$other'): " +
        "snapshot/bucketed progress notions are query inputs, not stream offsets")
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val man = Paged.readManifest(path, conf)
    val pd = Paged.pagesDir(path)
    mode match {
      case "offset" =>
        val pages = man.get("pages").asLong()
        Array.tabulate(pages.toInt)(k =>
          DirPartition(s"$pd/pg=$k", Some((Paged.PAGE_COL, k.toLong)), None))
      case "snapshot" =>
        val it = man.get("blocks").elements()
        val blocks = ArrayBuffer.empty[Long]
        while (it.hasNext) blocks += it.next().asLong()
        blocks.iterator.map(b =>
          DirPartition(s"$pd/blk=$b", Some((Paged.BLOCK_COL, b)), None): InputPartition).toArray
      case "keyset" =>
        // startCursor resumes the chain mid-way — the reference restarts
        // its id_gt loop from the last PERSISTED id; any previously
        // observed batch boundary is a valid resume point. `_step`
        // counts from 0 within the resumed run, as a restarted
        // extraction's page counter would.
        Array(KeysetPartition(path, startCursor))
      case "bucketed" =>
        val nBuckets = man.get("nBuckets").asInt()
        addresses match {
          case None =>
            Array.tabulate(nBuckets)(b => DirPartition(s"$pd/bkt=$b", None, None))
          case Some(addrs) =>
            // chunks of <= chunkSize per request, each confined to the one
            // bucket that can hold its addresses — untouched buckets are
            // never read (the pruning PagedSpec asserts)
            addrs.groupBy(a => math.floorMod(a, nBuckets.toLong)).toArray.sortBy(_._1).flatMap {
              case (b, as) => as.toArray.sorted.grouped(chunkSize).map(chunk =>
                DirPartition(s"$pd/bkt=$b", None, Some(chunk.toSet)): InputPartition)
            }
        }
      case other => throw new IllegalArgumentException(s"graft-pages: unknown mode '$other'")
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableHadoopConf(SparkSession.active.sparkContext.hadoopConfiguration)
    val tz = SparkSession.active.sessionState.conf.sessionLocalTimeZone
    // schema travels as Catalyst JSON, not DDL: a count() prunes required
    // down to ZERO columns, and the empty struct round-trips through json
    // but not through DDL
    PagedReaderFactory(required.json, cursorField, tz, conf)
  }
}

/** The page counter as a stream offset. */
final case class PageOffset(pages: Long) extends Offset {
  override def json(): String = pages.toString
}

final class PagedMicroBatchStream(path: String, required: StructType) extends MicroBatchStream {
  private def conf = SparkSession.active.sparkContext.hadoopConfiguration

  override def initialOffset(): Offset = PageOffset(0L)
  override def deserializeOffset(json: String): Offset = PageOffset(json.trim.toLong)
  // the manifest is rewritten LAST by the generators, so a page count read
  // here only ever names fully-published pages
  override def latestOffset(): Offset =
    PageOffset(Paged.readManifest(path, conf).get("pages").asLong())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[PageOffset].pages
    val b = end.asInstanceOf[PageOffset].pages
    (a until b).map(k =>
      DirPartition(s"${Paged.pagesDir(path)}/pg=$k", Some((Paged.PAGE_COL, k)), None)
        : InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val tz = SparkSession.active.sessionState.conf.sessionLocalTimeZone
    PagedReaderFactory(required.json, null, tz, new SerializableHadoopConf(conf))
  }

  override def commit(end: Offset): Unit = () // pages are immutable; the offset is the state
  override def stop(): Unit = ()
}

/** The keyset chain position as a stream offset: how many batches have been
  * consumed and the cursor addressing the NEXT one. `cursor` is derived
  * from `steps` (it is the max id of batch steps-1), carried alongside so
  * a restart can resume the walk without replaying the chain.
  */
final case class KeysetOffset(steps: Long, cursor: String) extends Offset {
  override def json(): String =
    s"""{"steps":$steps,"cursor":"$cursor"}"""
}

final class PagedKeysetMicroBatchStream(path: String, required: StructType,
    cursorField: String, startCursor: String) extends MicroBatchStream {
  private def conf = SparkSession.active.sparkContext.hadoopConfiguration

  override def initialOffset(): Offset = KeysetOffset(0L, startCursor)
  override def deserializeOffset(json: String): Offset = {
    val node = new ObjectMapper().readTree(json)
    KeysetOffset(node.get("steps").asLong(), node.get("cursor").asText())
  }
  // manifest written LAST by the keyset generators: the (steps, lastCursor)
  // pair read here only ever names fully-published batches
  override def latestOffset(): Offset = {
    val man = Paged.readManifest(path, conf)
    val lc = man.get("lastCursor")
    require(lc != null,
      "graft-pages keyset streaming requires a manifest with 'lastCursor' " +
        "(republish with serveKeysetPages/appendKeysetPages)")
    KeysetOffset(man.get("steps").asLong(), lc.asText())
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[KeysetOffset]
    val b = end.asInstanceOf[KeysetOffset]
    if (b.steps <= a.steps) Array.empty
    else Array(KeysetPartition(path, a.cursor, maxSteps = b.steps - a.steps, stepBase = a.steps))
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val tz = SparkSession.active.sessionState.conf.sessionLocalTimeZone
    PagedReaderFactory(required.json, cursorField, tz, new SerializableHadoopConf(conf))
  }

  override def commit(end: Offset): Unit = () // batches are immutable; the offset is the state
  override def stop(): Unit = ()
}

final case class PagedReaderFactory(requiredJson: String, cursorField: String,
    timeZoneId: String, conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val required = org.apache.spark.sql.types.DataType.fromJson(requiredJson).asInstanceOf[StructType]
    partition match {
      case DirPartition(dir, prov, addrFilter) =>
        new DirPageReader(dir, required, prov, addrFilter, cursorField, timeZoneId, conf.value)
      case KeysetPartition(root, startCursor, maxSteps, stepBase) =>
        new KeysetReader(root, required, cursorField, timeZoneId, conf.value, startCursor,
          maxSteps, stepBase)
    }
  }
}

/** Shared page-file line iteration + required-row assembly. */
private[sources] abstract class PageReaderBase(required: StructType, provCols: Set[String],
    mustParse: Seq[String], timeZoneId: String, conf: Configuration)
    extends PartitionReader[InternalRow] {

  // parse only the payload fields the query needs (+ any the reader itself
  // needs, e.g. the cursor/address key) — decode-level column pruning
  protected val parseSchema: StructType = {
    val payload = required.fields.filterNot(f => provCols.contains(f.name))
    val extra = mustParse.filterNot(n => payload.exists(_.name == n))
      .map(n => StructField(n, LongType))
    StructType(payload ++ extra)
  }
  private val parse = JsonLines.parserFor(parseSchema, timeZoneId)
  private val fromParsed: Array[Int] = required.fields.map(f =>
    if (provCols.contains(f.name)) -1 else parseSchema.fieldIndex(f.name))

  protected def keyIdx(name: String): Int = parseSchema.fieldIndex(name)

  protected def linesOf(dir: String): Iterator[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Iterator.empty
    else fs.listStatus(p).iterator
      .filter(s => s.isFile && s.getLen > 0 && s.getPath.getName.startsWith("part-"))
      .map(_.getPath).toArray.sortBy(_.getName).iterator
      .flatMap { f =>
        val br = new BufferedReader(new InputStreamReader(fs.open(f), StandardCharsets.UTF_8))
        new Iterator[String] {
          private var nextLine = br.readLine()
          override def hasNext: Boolean = { if (nextLine == null) br.close(); nextLine != null }
          override def next(): String = { val l = nextLine; nextLine = br.readLine(); l }
        }
      }
  }

  protected def parsed(dir: String): Iterator[InternalRow] = linesOf(dir).flatMap(parse)

  /** Assemble an output row: payload fields from the parsed row, provenance
    * fields from `provValue`. */
  protected def assemble(row: InternalRow, provValue: Long): InternalRow = {
    val out = new GenericInternalRow(required.length)
    var i = 0
    while (i < required.length) {
      val src = fromParsed(i)
      out.update(i, if (src < 0) provValue else row.get(src, parseSchema(src).dataType))
      i += 1
    }
    out
  }
}

final class DirPageReader(dir: String, required: StructType, prov: Option[(String, Long)],
    addrFilter: Option[Set[Long]], cursorField: String, timeZoneId: String, conf: Configuration)
    extends PageReaderBase(required, prov.map(_._1).toSet,
      if (addrFilter.isDefined) Seq(cursorField) else Seq.empty, timeZoneId, conf) {

  private val ki = if (addrFilter.isDefined) keyIdx(cursorField) else -1
  private val it = {
    val base = parsed(dir)
    addrFilter match {
      case Some(s) => base.filter(r => !r.isNullAt(ki) && s.contains(r.getLong(ki)))
      case None => base
    }
  }
  private var current: InternalRow = _
  override def next(): Boolean = { if (it.hasNext) { current = it.next(); true } else false }
  override def get(): InternalRow = assemble(current, prov.map(_._2).getOrElse(0L))
  override def close(): Unit = ()
}

/** Walks the `id_gt` cursor chain: fetch batch at cursor c, emit its rows
  * (tagged with the step index), extract the next cursor as the batch's max
  * id — EXACTLY the reference's keyset loop, with the cursor coming from
  * the response data itself rather than a precomputed list.
  */
final class KeysetReader(root: String, required: StructType, cursorField: String,
    timeZoneId: String, conf: Configuration, startCursor: String = "start",
    maxSteps: Long = Long.MaxValue, stepBase: Long = 0L)
    extends PageReaderBase(required, Set(Paged.STEP_COL), Seq(cursorField), timeZoneId, conf) {

  require(cursorField != null, "graft-pages keyset mode requires 'cursorField'")
  private val ki = keyIdx(cursorField)
  private var cursor = startCursor
  private var step = -1L
  private var batch: Iterator[InternalRow] = Iterator.empty
  private var maxId = Long.MinValue
  private var done = false
  private var current: InternalRow = _

  private def advance(): Unit = {
    // a streaming micro-batch drains EXACTLY maxSteps batches and stops —
    // the next trigger's partition resumes from the offset's cursor
    if (step + 1 >= maxSteps) { done = true; return }
    val rows = parsed(s"${Paged.pagesDir(root)}/cur=$cursor")
    if (rows.isEmpty) { done = true } else { batch = rows; step += 1; maxId = Long.MinValue }
  }

  override def next(): Boolean = {
    while (!batch.hasNext && !done) {
      if (step >= 0) {
        if (maxId == Long.MinValue) { done = true } // defensive: batch had no usable ids
        else cursor = maxId.toString
      }
      if (!done) advance()
    }
    if (batch.hasNext) {
      current = batch.next()
      if (!current.isNullAt(ki)) maxId = math.max(maxId, current.getLong(ki))
      true
    } else false
  }
  override def get(): InternalRow = assemble(current, stepBase + step)
  override def close(): Unit = ()
}
