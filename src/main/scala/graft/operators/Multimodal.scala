package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed batch-wise.
  *
  * The Spark-side design is real and tested — schema, partitioning, the
  * per-partition batch shape — while the actual media decode is a STUB
  * (this container ships no image/audio codecs): `decodeStub` derives
  * deterministic fake metadata from the bytes, exactly where a JNI/FFI
  * decoder (or, from PySpark, a pandas `mapInPandas` UDF over the same
  * schema) would plug in.
  *
  * Scale notes: payloads stay opaque binary end-to-end — never exploded,
  * never shuffled unless the metadata requires it; decode happens in a
  * single `mapPartitions` pass (one batch per partition, the same shape a
  * vectorized Arrow UDF gets), and the output carries only the narrow
  * metadata struct, so downstream ops never move the media bytes again.
  */
object Multimodal {

  /** Canonical multimodal schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("byte_len", LongType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("duration_ms", LongType, nullable = false))), nullable = true)))

  /** Wrap any (id, string-content) frame into the multimodal shape: the
    * UTF-8 bytes become the payload; modality is derived from the id. Used
    * to exercise the plumbing on the `documents` testdata.
    */
  def fromText(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = encode(col(textCol), "UTF-8")
    val modality = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (pmod(col(idCol), lit(3)) + 1).cast("int"))
    docs.select(
      col(idCol).cast("long").as("media_id"),
      modality.as("modality"),
      payload.as("payload"),
      struct(
        octet_length(col(textCol)).cast("long").as("byte_len"),
        concat(lit("fake/"), modality).as("format"),
        (pmod(col(idCol), lit(640)) + 1).cast("int").as("width"),
        (pmod(col(idCol), lit(480)) + 1).cast("int").as("height"),
        (octet_length(col(textCol)) * 10).cast("long").as("duration_ms")).as("meta"))
  }

  /** Decoded-feature schema produced by [[decodeStub]]. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType), nullable = false)))

  /** STUB decoder — the seam where a real codec goes. Runs per partition
    * over an iterator of rows (the batch shape a real vectorized decoder
    * wants). Deterministic fake: checksum = sum of bytes, frame count from
    * length, an 8-dim "feature" from evenly-sampled bytes (≈ frame-sample /
    * resize / feature-extract for free).
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "modality", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val modality = r.getString(1)
        val bytes = Option(r.getAs[Array[Byte]](2)).getOrElse(Array.emptyByteArray)
        val checksum = bytes.foldLeft(0L)((acc, b) => acc + (b & 0xff))
        val nFrames = 1 + bytes.length / 64
        val feature = Array.tabulate(8) { i =>
          if (bytes.isEmpty) 0.0
          else (bytes(math.min((i.toLong * bytes.length / 8).toInt, bytes.length - 1)) & 0xff) / 255.0
        }
        Row(id, modality, bytes.length.toLong, checksum, nFrames, feature.toSeq)
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }
}
