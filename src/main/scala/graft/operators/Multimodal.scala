package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
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

  /** Frame sampling with built-ins only — no UDF, no decode: treat the
    * payload as fixed-size `frameBytes` frames and keep every `stride`-th.
    * `sequence` + `explode` generate the kept frame indices and a codegen'd
    * binary `substr` slices each frame, so the whole op stays inside one
    * WholeStageCodegen pipeline: the full payload is never shuffled, and
    * each output row carries only its own `frameBytes`-sized slice.
    * Empty payloads yield one empty frame; null payloads are dropped
    * explicitly (nothing to sample). The generator must stay top-level in
    * its select (Spark rejects explode nested in any other expression), so
    * the sequence is generated as longs and sliced in a follow-up
    * projection.
    */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val nFrames = greatest(lit(1L),
      ceil(octet_length(col("payload")) / lit(frameBytes.toDouble)).cast("long"))
    media
      .filter(col("payload").isNotNull)
      .select(col("media_id"), col("modality"), col("payload"),
        explode(sequence(lit(0L), nFrames - 1, lit(stride.toLong))).as("frame_no"))
      .select(col("media_id"), col("modality"), col("frame_no"),
        col("payload").substr((col("frame_no") * frameBytes + 1).cast("int"), lit(frameBytes))
          .as("frame"))
  }

  /** Deterministic synthetic PNG/JPEG payloads from an id column — real
    * byte-level files-in-miniature (signatures, chunk/segment structure,
    * big-endian dimension fields), so
    * [[org.apache.spark.sql.graftnative.NativeColumns.imageDims]] exercises
    * its actual parse path against bytes it did not produce:
    *
    *  - even ids: a PNG signature + IHDR chunk (width/height big-endian at
    *    the spec offsets);
    *  - odd ids: a JPEG whose start-of-frame OFFSET VARIES per id — an
    *    APP0/JFIF segment plus 0-2 COM segments of id-dependent length
    *    before SOF0 — so any fixed-offset shortcut parses garbage;
    *  - ids % 17 == 0: non-image bytes (the corrupt-row case a corpus
    *    ingest must tolerate).
    *
    * Built entirely from codegen'd Column expressions (hex/lpad/unhex
    * big-endian encoding, binary concat) — no UDF, and the id -> dims map
    * is plain arithmetic, so an external SQL engine can state the expected
    * parse result without a byte-level re-implementation.
    */
  def syntheticImages(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    def bytes(xs: Int*): Column = lit(xs.map(_.toByte).toArray)
    def be32(x: Column): Column = unhex(lpad(hex(x), 8, "0"))
    def be16(x: Column): Column = unhex(lpad(hex(x), 4, "0"))
    val empty = lit(Array.emptyByteArray)
    val w = pmod(id, lit(640)) + 1
    val h = pmod(id, lit(480)) + 1
    val png = concat(
      bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      bytes(0, 0, 0, 13), encode(lit("IHDR"), "UTF-8"), be32(w), be32(h),
      bytes(8, 2, 0, 0, 0))
    def comSeg(padLen: Column): Column = concat(
      bytes(0xff, 0xfe), be16(padLen + 2),
      encode(repeat(lit("x"), padLen.cast("int")), "UTF-8"))
    val nCom = pmod(id, lit(3))
    val jpeg = concat(
      bytes(0xff, 0xd8),
      bytes(0xff, 0xe0, 0x00, 0x10), encode(lit("JFIF"), "UTF-8"),
      bytes(0, 1, 1, 0, 0, 1, 0, 1, 0, 0),
      when(nCom >= 1, comSeg(pmod(id, lit(5)) + 3)).otherwise(empty),
      when(nCom >= 2, comSeg(pmod(id, lit(7)) + 2)).otherwise(empty),
      bytes(0xff, 0xc0, 0x00, 0x11, 0x08), be16(h), be16(w),
      bytes(3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    val garbage = concat(encode(lit("GARBAGE"), "UTF-8"), be32(id))
    docs.select(
      id.as("media_id"),
      when(pmod(id, lit(17)) === 0, garbage)
        .when(pmod(id, lit(2)) === 0, png)
        .otherwise(jpeg).as("payload"))
  }

  /** Deterministic synthetic RIFF/WAVE headers from an id column — the
    * audio counterpart of [[syntheticImages]], exercising
    * [[org.apache.spark.sql.graftnative.NativeColumns.wavMeta]]'s real
    * chunk walk: a LIST chunk of id-dependent (even) length precedes the
    * `fmt ` chunk for 2 of 3 ids, so fmt/data sit at VARIABLE offsets; the
    * `data` chunk is header-only (length field without payload — the
    * header-sniff contract never needs the bytes). All size/rate fields
    * are little-endian per the spec — the opposite byte order of the
    * PNG/JPEG generator, so an endianness slip in either parser cannot
    * pass both. ids % 13 == 0 are non-RIFF garbage.
    */
  def syntheticWavs(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    def bytes(xs: Int*): Column = lit(xs.map(_.toByte).toArray)
    def byteOf(x: Column, i: Int): Column =
      unhex(lpad(hex(shiftright(x, 8 * i).bitwiseAND(lit(255L))), 2, "0"))
    def le16(x: Column): Column = concat(byteOf(x, 0), byteOf(x, 1))
    def le32(x: Column): Column = concat(byteOf(x, 0), byteOf(x, 1), byteOf(x, 2), byteOf(x, 3))
    val rate = (pmod(id, lit(5)) + 1) * 8000L
    val channels = pmod(id, lit(2)) + 1
    val bits = pmod(id, lit(3)) * 8 + 8
    val blockAlign = channels * bits / lit(8)
    val byteRate = rate * blockAlign
    val dataLen = (pmod(id, lit(1000)) + 1) * blockAlign
    val padLen = (pmod(id, lit(5)) + 2) * 2
    val listChunk = concat(encode(lit("LIST"), "UTF-8"), le32(padLen),
      encode(repeat(lit("x"), padLen.cast("int")), "UTF-8"))
    val fmtChunk = concat(encode(lit("fmt "), "UTF-8"), le32(lit(16L)),
      le16(lit(1L)), le16(channels), le32(rate), le32(byteRate),
      le16(blockAlign), le16(bits))
    val wav = concat(
      encode(lit("RIFF"), "UTF-8"), le32(dataLen + 36), encode(lit("WAVE"), "UTF-8"),
      when(pmod(id, lit(3)) =!= 0, listChunk).otherwise(lit(Array.emptyByteArray)),
      fmtChunk,
      encode(lit("data"), "UTF-8"), le32(dataLen))
    val garbage = concat(encode(lit("NOTWAV"), "UTF-8"), le32(id))
    docs.select(
      id.as("media_id"),
      when(pmod(id, lit(13)) === 0, garbage).otherwise(wav).as("payload"))
  }

  /** Deterministic synthetic ISO-BMFF (MP4) containers from an id column —
    * the video counterpart of [[syntheticImages]]/[[syntheticWavs]],
    * exercising [[org.apache.spark.sql.graftnative.NativeColumns
    * .mp4Meta]]'s real box walk. Structure varies per id so only a
    * correct parser lands on mvhd:
    *  - a `free` box of id-dependent size precedes `moov` for 2 of 3 ids;
    *  - `moov` opens with an id-dependent `udta` child for even ids;
    *  - `moov` uses the 64-bit LARGESIZE header form for ids % 5 == 0;
    *  - `mvhd` is VERSION 1 (64-bit times; duration deliberately above
    *    2^32, which a v0-offset parser misreads) for ids % 7 == 0,
    *    version 0 otherwise.
    * All sizes big-endian per the spec — the opposite byte order of the
    * WAV generator, so an endianness slip cannot pass both families.
    * ids % 11 == 0 are garbage.
    */
  def syntheticMp4s(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    def byteOf(x: Column, i: Int): Column =
      unhex(lpad(hex(shiftright(x, 8 * i).bitwiseAND(lit(255L))), 2, "0"))
    def be32(x: Column): Column = concat(byteOf(x, 3), byteOf(x, 2), byteOf(x, 1), byteOf(x, 0))
    def be64(x: Column): Column = concat(
      byteOf(x, 7), byteOf(x, 6), byteOf(x, 5), byteOf(x, 4),
      byteOf(x, 3), byteOf(x, 2), byteOf(x, 1), byteOf(x, 0))
    def fourcc(t: String): Column = encode(lit(t), "UTF-8")
    def zeros(n: Int): Column = lit(Array.fill(n)(0.toByte))
    val brand = when(pmod(id, lit(2)) === 0, "isom").otherwise("mp41")
    val ftyp = concat(be32(lit(16L)), fourcc("ftyp"), encode(brand, "UTF-8"), be32(lit(0L)))
    val padLen = (pmod(id, lit(5)) + 2) * 4
    val freeBox = concat(be32(padLen + 8), fourcc("free"),
      encode(repeat(lit("x"), padLen.cast("int")), "UTF-8"))
    val uLen = (pmod(id, lit(7)) + 1) * 2
    val udta = concat(be32(uLen + 8), fourcc("udta"),
      encode(repeat(lit("u"), uLen.cast("int")), "UTF-8"))
    val ts = (pmod(id, lit(4)) + 1) * 600L
    val durBase = pmod(id, lit(9000)) + 1 + ts
    val v1 = pmod(id, lit(7)) === 0
    val dur = when(v1, durBase + 4294967296L).otherwise(durBase)
    val mvhdV0 = concat(be32(lit(108L)), fourcc("mvhd"),
      zeros(4), zeros(4), zeros(4), be32(ts), be32(durBase), zeros(80))
    val mvhdV1 = concat(be32(lit(120L)), fourcc("mvhd"),
      lit(Array[Byte](1, 0, 0, 0)), zeros(8), zeros(8), be32(ts), be64(dur), zeros(80))
    val mvhdBox = when(v1, mvhdV1).otherwise(mvhdV0)
    val children = concat(
      when(pmod(id, lit(2)) === 0, udta).otherwise(lit(Array.emptyByteArray)),
      mvhdBox)
    val childLen = length(children).cast("long")
    val moov = when(pmod(id, lit(5)) === 0,
      concat(be32(lit(1L)), fourcc("moov"), be64(childLen + 16), children))
      .otherwise(concat(be32(childLen + 8), fourcc("moov"), children))
    val mp4 = concat(ftyp,
      when(pmod(id, lit(3)) =!= 0, freeBox).otherwise(lit(Array.emptyByteArray)),
      moov)
    val garbage = concat(fourcc("XXXX"), be32(id), encode(repeat(lit("g"), 16), "UTF-8"))
    docs.select(
      id.as("media_id"),
      when(pmod(id, lit(11)) === 0, garbage).otherwise(mp4).as("payload"))
  }

  /** Deterministic content body for the near-dup fixtures: `segs` md5
    * digests of `"<id>|m<j>"` concatenated to 16*segs high-entropy bytes —
    * recomputable by any SQL engine with md5. `mutate` replaces the LAST
    * segment with md5 of `"<id>|mut"`: a 16-byte content edit, so the twin
    * payload sits at small perceptual Hamming distance from its base
    * (measured <= 5 over the testdata id range) while unrelated ids are
    * independent ~uniform 64-bit hashes (spurious pair probability
    * ~C(64,<=6)/2^64 per pair — none observed at either SF).
    */
  private def contentBody(id: Column, segs: Int, mutate: Boolean): Column = {
    def seg(tag: String): Column = md5(encode(concat(id.cast("string"), lit(tag)), "UTF-8"))
    val parts = (0 until segs - 1).map(j => seg(s"|m$j")) :+
      (if (mutate) seg("|mut") else seg(s"|m${segs - 1}"))
    unhex(concat(parts: _*))
  }

  /** [[syntheticImages]] headers + [[contentBody]] payloads + planted
    * near-dup twins (ids < 25 re-appear as id+100000 with the mutated
    * body) — the perceptual-dedup fixture: every row is a content-rich
    * Column-synthesized payload (PNG/JPEG headers stay structurally real;
    * the %17 garbage rows keep a body too, so unparseable media still
    * participates in content dedup instead of collapsing into a
    * header-only clique).
    */
  def imageNearDupCorpus(docs: DataFrame, idCol: String): DataFrame =
    nearDupCorpus(syntheticImages(docs, idCol))

  /** The audio twin of [[imageNearDupCorpus]]: [[syntheticWavs]] headers
    * (little-endian RIFF walks, %13 garbage) + content bodies + the same
    * planted twins.
    */
  def audioNearDupCorpus(docs: DataFrame, idCol: String): DataFrame =
    nearDupCorpus(syntheticWavs(docs, idCol))

  private def nearDupCorpus(base: DataFrame): DataFrame = {
    val withBody = base.select(col("media_id"),
      concat(col("payload"), contentBody(col("media_id"), 16, mutate = false)).as("payload"))
    val twins = base.filter(col("media_id") < 25).select(
      (col("media_id") + 100000L).as("media_id"),
      concat(col("payload"), contentBody(col("media_id"), 16, mutate = true)).as("payload"))
    withBody.unionByName(twins)
  }

  /** Deterministic FULLY-DECODABLE synthetic PNGs with planted RE-ENCODE
    * twins — the pixel-level near-dup fixture. Every valid row is a real
    * 16×16 8-bit grayscale PNG: signature, IHDR, one IDAT whose zlib
    * stream uses STORED deflate blocks (RFC 1951 §3.2.4 — btype=00 framing
    * is buildable from codegen'd Column byte concat, and inflate treats it
    * identically to compressed blocks), scanlines = filter byte 0 + the 16
    * md5 bytes of `"<id>|px<row>"` (pseudo-random pixels: distinct ids sit
    * ~32 dHash bits apart, so nothing but the planted twins pairs up —
    * measured at both SFs). Chunk CRCs / Adler32 are dummy zeros —
    * [[graft.functions.expressions.PngPixelHash]] deliberately skips
    * trailer validation, and ParserFuzzSpec's ImageIO differential covers
    * real-CRC streams.
    *
    * Planted twins (`id < 25`, at `id + 100000`): the SAME pixels
    * re-encoded with a DIFFERENT byte stream — two stored blocks instead
    * of one plus a different zlib header (0x789C vs 0x7801) — i.e. the
    * re-compressed duplicate a crawled corpus actually contains. The
    * byte-level [[perceptualPairs]] provably misses these (the md5 body
    * never repeats); the pixel path lands them at Hamming 0.
    *
    * Corrupt rows (`id >= 25` only, so every twin base stays valid):
    * `id % 13 == 0` truncates mid-IDAT (the torn-download case — decode
    * must return null, never throw); `id % 17 == 0` is non-PNG garbage.
    */
  def pixelPngCorpus(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    def bytes(xs: Int*): Column = lit(xs.map(_.toByte).toArray)
    def be32(x: Long): Column = bytes(
      ((x >> 24) & 0xff).toInt, ((x >> 16) & 0xff).toInt,
      ((x >> 8) & 0xff).toInt, (x & 0xff).toInt)
    def cc(t: String): Column = encode(lit(t), "UTF-8")
    val crc0 = bytes(0, 0, 0, 0)
    // 16 scanlines of (filter=0, 16 md5 pixel bytes) = 272 raw bytes
    def scan(src: Column, y: Int): Column = concat(bytes(0),
      unhex(md5(encode(concat(src.cast("string"), lit(s"|px$y")), "UTF-8"))))
    def raw(src: Column): Column = concat((0 until 16).map(y => scan(src, y)): _*)
    // layout A: one stored block — hdr 0x7801, bfinal=1/btype=00,
    // LEN=272 LE, NLEN=~272 LE, raw, dummy adler
    def zlibA(src: Column): Column = concat(
      bytes(0x78, 0x01, 0x01, 0x10, 0x01, 0xef, 0xfe), raw(src), bytes(0, 0, 0, 0))
    // layout B (the re-encode): hdr 0x789C, TWO stored blocks split at
    // 136 bytes (LEN=136 LE 0x88 0x00, NLEN 0x77 0xFF) — same pixels,
    // different compressed byte stream
    def zlibB(src: Column): Column = {
      val r = raw(src)
      concat(bytes(0x78, 0x9c, 0x00, 0x88, 0x00, 0x77, 0xff), r.substr(1, 136),
        bytes(0x01, 0x88, 0x00, 0x77, 0xff), r.substr(137, 136), bytes(0, 0, 0, 0))
    }
    val ihdr = concat(be32(13), cc("IHDR"), be32(16), be32(16),
      bytes(8, 0, 0, 0, 0), crc0)
    val sig = bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val iend = concat(be32(0), cc("IEND"), crc0)
    def png(zlib: Column, zlibLen: Long): Column =
      concat(sig, ihdr, be32(zlibLen), cc("IDAT"), zlib, crc0, iend)
    val pngA = png(zlibA(id), 283) // 2 + 5 + 272 + 4
    val pngB = png(zlibB(id), 288) // 2 + (5+136)*2 + 4
    // cut 60 bytes off the tail: the IDAT length field now promises more
    // data than the payload carries
    val truncated = pngA.substr(lit(1), length(pngA) - 60)
    val garbage = concat(encode(lit("NOTPNG"), "UTF-8"), be32(16))
    val base = docs.select(
      id.as("media_id"),
      when(id >= 25 && pmod(id, lit(13)) === 0, truncated)
        .when(id >= 25 && pmod(id, lit(17)) === 0, garbage)
        .otherwise(pngA).as("payload"))
    val twins = docs.filter(id < 25).select(
      (id + 100000L).as("media_id"), pngB.as("payload"))
    base.unionByName(twins)
  }

  /** Pixel-level fingerprint projection: `(media_id, pxhash)` via the
    * codegen'd [[graft.functions.expressions.PngPixelHash]] — NULL pxhash
    * for undecodable payloads (they keep the byte-level [[perceptualHash]]
    * family instead). Zero-shuffle: only the 8-byte hash flows downstream.
    */
  def pixelHash(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame =
    media.select(
      col(idCol).cast("long").as("media_id"),
      org.apache.spark.sql.graftnative.NativeColumns
        .pngPixelHash(col(payloadCol)).as("pxhash"))

  /** Pixel-level near-dup pairs: [[pixelHash]] → the same pigeonhole chunk
    * banding + exact Hamming verify as [[perceptualPairs]]
    * ([[Dedup.hammingPairs64]]). Undecodable payloads (null pxhash) drop
    * out here and stay covered by the byte-level family. Output
    * `(media_id_1 < media_id_2, hamming)`.
    */
  def pixelPairs(
      media: DataFrame,
      maxHamming: Int = 2,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      boundary: Boundary = Boundary.Local): DataFrame =
    Dedup.hammingPairs64(
      pixelHash(media, idCol, payloadCol)
        .filter(col("pxhash").isNotNull)
        .withColumnRenamed("media_id", "doc_id"),
      "pxhash", maxHamming, boundary)
      .select(col("doc_id_1").as("media_id_1"), col("doc_id_2").as("media_id_2"),
        col("hamming"))

  /** Pixel pairs → connected components → keep/drop for EVERY input row
    * (undecodable rows are singletons) — [[perceptualClusters]] with the
    * pixel fingerprint.
    */
  def pixelClusters(
      media: DataFrame,
      maxHamming: Int = 2,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      boundary: Boundary = Boundary.Local): DataFrame = {
    val pairs = pixelPairs(media, maxHamming, idCol, payloadCol, boundary)
    val comp = Dedup.connectedComponents(pairs, "media_id_1", "media_id_2")
    media.select(col(idCol).cast("long").as("media_id"))
      .join(comp.withColumnRenamed("node", "media_id"), Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("cluster"), col("media_id")).as("component"),
        (coalesce(col("cluster"), col("media_id")) === col("media_id")).as("keep"))
  }

  /** Deterministic FULLY-DECODABLE synthetic baseline JPEGs with planted
    * RE-ENCODE twins — the JPEG pixel-level near-dup fixture, the
    * [[pixelPngCorpus]] design carried to the DOMINANT crawl format.
    * Payloads come from the [[graft.functions.expressions.SyntheticJpeg]]
    * native encoder (entropy coding is not Column byte algebra): real
    * JFIF streams — DQT/SOF0/DHT/SOS, Huffman entropy data with byte
    * stuffing — over a smooth 16×16 bilinear md5 field per id (smooth, so
    * requantization moves dHash cells by only a few gray levels; random
    * across ids, so non-twin hashes sit ~32 bits apart).
    *
    * Planted twins at `id + 100000`:
    *  - `id < 13` — FRAMING re-encode: same quant table and coefficients,
    *    different Huffman tables, restart markers, APP0 stripped (the
    *    jpegtran-optimize case). Decodes bit-identically ⇒ Hamming 0.
    *  - `13 <= id < 25` — REQUANTIZED re-encode: coarser quant table (the
    *    quality-bump case). Near-identical pixels ⇒ small Hamming.
    * And at `id + 200000` for `id < 8` — the EXIF-ROTATION re-encode: the
    * image stored physically rotated 90° with orientation 6 marked (the
    * phone-camera duplicate); the decoder's orientation normalization
    * lands it at Hamming 0 against both the base and the framing twin.
    *
    * Corrupt rows (`id >= 25` only, twin bases stay valid): `%13` torn
    * mid-entropy (NULL, never throw), `%17` non-JPEG garbage, `%19` a
    * PROGRESSIVE-marked header (SOF2) the baseline decoder must cleanly
    * reject — those rows stay covered by the byte-level family.
    */
  def pixelJpegCorpus(docs: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.graftnative.NativeColumns.syntheticJpeg
    val id = col(idCol).cast("long")
    val base = docs.select(
      id.as("media_id"),
      when(id >= 25 && pmod(id, lit(13)) === 0, syntheticJpeg(id, "truncated"))
        .when(id >= 25 && pmod(id, lit(17)) === 0, syntheticJpeg(id, "garbage"))
        .when(id >= 25 && pmod(id, lit(19)) === 0, syntheticJpeg(id, "progressive"))
        .otherwise(syntheticJpeg(id, "base")).as("payload"))
    val twins = docs.filter(id < 25).select(
      (id + 100000L).as("media_id"),
      when(id < 13, syntheticJpeg(id, "framing"))
        .otherwise(syntheticJpeg(id, "quant")).as("payload"))
    val exifTwins = docs.filter(id < 8).select(
      (id + 200000L).as("media_id"), syntheticJpeg(id, "exif").as("payload"))
    base.unionByName(twins).unionByName(exifTwins)
  }

  /** The PROGRESSIVE-delivery corpus (r16): baseline bases with planted
    * `jpegtran -progressive` twins at `id + 100000` for `id < 20` — the
    * SAME coefficients re-delivered as a real SOF2 multi-scan stream (DC
    * successive approximation, two spectral-selection AC bands each
    * refined Al=1→0), which decodes to bit-identical samples ⇒ Hamming
    * EXACTLY 0. Corrupt rows (`id >= 20`): `%13` progressive torn
    * mid-scan, `%17` the SOF2-FLIPPED header whose baseline scan script
    * Annex G forbids — both hash NULL and stay covered by the byte-level
    * family.
    */
  def jpegProgressiveCorpus(docs: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.graftnative.NativeColumns.syntheticJpeg
    val id = col(idCol).cast("long")
    val torn = substring(syntheticJpeg(id, "prog"), 1, 160)
    val base = docs.select(
      id.as("media_id"),
      when(id >= 20 && pmod(id, lit(13)) === 0, torn)
        .when(id >= 20 && pmod(id, lit(17)) === 0, syntheticJpeg(id, "progressive"))
        .otherwise(syntheticJpeg(id, "base")).as("payload"))
    val twins = docs.filter(id < 20).select(
      (id + 100000L).as("media_id"), syntheticJpeg(id, "prog").as("payload"))
    base.unionByName(twins)
  }

  /** JPEG pixel-level fingerprint projection: `(media_id, pxhash)` via the
    * codegen'd [[graft.functions.expressions.JpegPixelHash]] — NULL pxhash
    * for anything not cleanly-decodable baseline (progressive, torn,
    * non-JPEG), which keeps the byte-level [[perceptualHash]] family.
    * Zero-shuffle: only the 8-byte hash flows downstream.
    */
  def jpegHash(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame =
    media.select(
      col(idCol).cast("long").as("media_id"),
      org.apache.spark.sql.graftnative.NativeColumns
        .jpegPixelHash(col(payloadCol)).as("pxhash"))

  /** JPEG pixel-level near-dup pairs — [[jpegHash]] through the same
    * pigeonhole banding + exact Hamming verify as [[pixelPairs]]. Output
    * `(media_id_1 < media_id_2, hamming)`.
    */
  def jpegPairs(
      media: DataFrame,
      maxHamming: Int = 4,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      boundary: Boundary = Boundary.Local): DataFrame =
    Dedup.hammingPairs64(
      jpegHash(media, idCol, payloadCol)
        .filter(col("pxhash").isNotNull)
        .withColumnRenamed("media_id", "doc_id"),
      "pxhash", maxHamming, boundary)
      .select(col("doc_id_1").as("media_id_1"), col("doc_id_2").as("media_id_2"),
        col("hamming"))

  /** JPEG pixel pairs → connected components → keep/drop for EVERY input
    * row (undecodable rows are singletons) — [[pixelClusters]] with the
    * JPEG fingerprint.
    */
  def jpegClusters(
      media: DataFrame,
      maxHamming: Int = 4,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      boundary: Boundary = Boundary.Local): DataFrame = {
    val pairs = jpegPairs(media, maxHamming, idCol, payloadCol, boundary)
    val comp = Dedup.connectedComponents(pairs, "media_id_1", "media_id_2")
    media.select(col(idCol).cast("long").as("media_id"))
      .join(comp.withColumnRenamed("node", "media_id"), Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("cluster"), col("media_id")).as("component"),
        (coalesce(col("cluster"), col("media_id")) === col("media_id")).as("keep"))
  }

  /** Deterministic FULLY-DECODABLE synthetic GIFs with planted RE-ENCODE
    * twins — the GIF leg of the pixel family, from the
    * [[graft.functions.expressions.SyntheticGif]] native generator (real
    * LZW streams; GifSpec differentially decodes them through ImageIO).
    *
    * Planted twins at `id + 100000`:
    *  - `id < 9`        — REBLOCK re-encode (GIF87a, different clear
    *                      cadence and sub-block sizes: the optimizer
    *                      pass; near-zero shared bytes, same raster);
    *  - `9 <= id < 17`  — PALETTE-PERMUTED re-encode (table reversed,
    *                      indices remapped: the palette-sorting pass);
    *  - `17 <= id < 25` — INTERLACED re-encode (4-pass row order: the
    *                      progressive-download export).
    * All three decode to the identical raster ⇒ dHash Hamming EXACTLY 0.
    *
    * Corrupt rows (`id >= 25` only): `%13` torn mid-sub-block, `%17`
    * non-GIF garbage, `%19` a container with NO color table the decoder
    * must cleanly reject — those keep the byte-level family.
    */
  def pixelGifCorpus(docs: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.graftnative.NativeColumns.syntheticGif
    val id = col(idCol).cast("long")
    val base = docs.select(
      id.as("media_id"),
      when(id >= 25 && pmod(id, lit(13)) === 0, syntheticGif(id, "truncated"))
        .when(id >= 25 && pmod(id, lit(17)) === 0, syntheticGif(id, "garbage"))
        .when(id >= 25 && pmod(id, lit(19)) === 0, syntheticGif(id, "noct"))
        .otherwise(syntheticGif(id, "base")).as("payload"))
    val twins = docs.filter(id < 25).select(
      (id + 100000L).as("media_id"),
      when(id < 9, syntheticGif(id, "reblock"))
        .when(id < 17, syntheticGif(id, "palperm"))
        .otherwise(syntheticGif(id, "interlace")).as("payload"))
    base.unionByName(twins)
  }

  /** GIF pixel-level fingerprint projection: `(media_id, pxhash)` via the
    * codegen'd [[graft.functions.expressions.GifPixelHash]] — NULL for
    * anything not cleanly decodable. Zero-shuffle.
    */
  def gifHash(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame =
    media.select(
      col(idCol).cast("long").as("media_id"),
      org.apache.spark.sql.graftnative.NativeColumns
        .gifPixelHash(col(payloadCol)).as("pxhash"))

  /** GIF pixel-level near-dup pairs — [[gifHash]] through the same
    * pigeonhole banding + exact Hamming verify as [[pixelPairs]].
    */
  def gifPairs(
      media: DataFrame,
      maxHamming: Int = 2,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      boundary: Boundary = Boundary.Local): DataFrame =
    Dedup.hammingPairs64(
      gifHash(media, idCol, payloadCol)
        .filter(col("pxhash").isNotNull)
        .withColumnRenamed("media_id", "doc_id"),
      "pxhash", maxHamming, boundary)
      .select(col("doc_id_1").as("media_id_1"), col("doc_id_2").as("media_id_2"),
        col("hamming"))

  /** GIF pixel pairs → connected components → keep/drop for EVERY input
    * row (undecodable rows are singletons).
    */
  def gifClusters(
      media: DataFrame,
      maxHamming: Int = 2,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      boundary: Boundary = Boundary.Local): DataFrame = {
    val pairs = gifPairs(media, maxHamming, idCol, payloadCol, boundary)
    val comp = Dedup.connectedComponents(pairs, "media_id_1", "media_id_2")
    media.select(col(idCol).cast("long").as("media_id"))
      .join(comp.withColumnRenamed("node", "media_id"), Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("cluster"), col("media_id")).as("component"),
        (coalesce(col("cluster"), col("media_id")) === col("media_id")).as("keep"))
  }

  /** Deterministic FULLY-DECODABLE synthetic VP8L WebPs with planted
    * RE-ENCODE twins — the WebP leg of the pixel family
    * ([[graft.functions.expressions.SyntheticWebp]]): real RIFF/VP8L
    * bitstreams WebpSpec round-trips pixel-exactly.
    *
    * Planted twins at `id + 100000`:
    *  - `id < 7`        — SUBTRACT-GREEN re-encode (transform on,
    *                      different prefix codes: the cwebp -z pass);
    *  - `7 <= id < 13`  — PREDICTOR re-encode (8×8 spatial prediction,
    *                      residual coding: the "different predictor set"
    *                      pass);
    *  - `13 <= id < 19` — PALETTE re-encode (64-entry color-indexing:
    *                      the palettization pass);
    *  - `19 <= id < 25` — COLOR-CACHE + LZ77 re-encode inside a VP8X
    *                      extended container with an XMP chunk.
    * All four decode to the identical raster ⇒ dHash Hamming EXACTLY 0.
    *
    * Corrupt rows (`id >= 25` only): `%13` torn mid-bitstream, `%17`
    * non-RIFF garbage, `%19` a LOSSY `VP8 `-only container (valid WebP
    * the lossless decoder must cleanly decline) — those keep the
    * byte-level family.
    */
  def pixelWebpCorpus(docs: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.graftnative.NativeColumns.syntheticWebp
    val id = col(idCol).cast("long")
    val base = docs.select(
      id.as("media_id"),
      when(id >= 25 && pmod(id, lit(13)) === 0, syntheticWebp(id, "truncated"))
        .when(id >= 25 && pmod(id, lit(17)) === 0, syntheticWebp(id, "garbage"))
        .when(id >= 25 && pmod(id, lit(19)) === 0, syntheticWebp(id, "lossy"))
        .otherwise(syntheticWebp(id, "base")).as("payload"))
    val twins = docs.filter(id < 25).select(
      (id + 100000L).as("media_id"),
      when(id < 7, syntheticWebp(id, "subg"))
        .when(id < 13, syntheticWebp(id, "pred"))
        .when(id < 19, syntheticWebp(id, "pal"))
        .otherwise(syntheticWebp(id, "cache")).as("payload"))
    base.unionByName(twins)
  }

  /** LOSSY-WebP duplicate-class corpus: lossless VP8L originals with two
    * planted REAL `VP8 ` re-encodes of the same raster per twin id — the
    * near-lossless CDN re-encode (qi=8, `media_id+100000`) and a coarser
    * second-generation re-encode (qi=25, `media_id+200000`), both
    * produced by the native [[graft.functions.expressions.Vp8Fixture]]
    * encoder (streams real libwebp decodes identically — Vp8FixtureSpec).
    * Corrupt classes keep totality honest: torn containers and malformed
    * `VP8 ` payloads hash NULL and stay singletons.
    */
  def pixelWebpLossyCorpus(docs: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.graftnative.NativeColumns.syntheticWebp
    val id = col(idCol).cast("long")
    val base = docs.select(
      id.as("media_id"),
      when(id >= 25 && pmod(id, lit(13)) === 0, syntheticWebp(id, "truncated"))
        .when(id >= 25 && pmod(id, lit(17)) === 0, syntheticWebp(id, "lossy"))
        .otherwise(syntheticWebp(id, "base")).as("payload"))
    val cdn = docs.filter(id < 25).select(
      (id + 100000L).as("media_id"), syntheticWebp(id, "vp8q8").as("payload"))
    val regen = docs.filter(id < 25).select(
      (id + 200000L).as("media_id"), syntheticWebp(id, "vp8q25").as("payload"))
    base.unionByName(cdn).unionByName(regen)
  }

  /** ANIMATED-WebP duplicate-class corpus (r16): still VP8L originals
    * with the two animation re-delivery classes planted —
    *  - `id + 100000` (`id < 20`): the SAME VP8L stream re-wrapped as an
    *    animation (VP8X animation flag + ANIM + ANMF frames; frame 2 is
    *    a DIFFERENT image) — the poster-frame rule lands it at Hamming
    *    EXACTLY 0 against the still;
    *  - `id + 200000` (`id < 10`): an animation whose first frame is the
    *    REAL lossy `VP8 ` q8 re-encode of the same raster (the
    *    GIF→animated-WebP conversion class) — within the Hamming-6
    *    threshold like the still lossy family.
    * Corrupt rows: `%13` of `id >= 20` torn mid-first-frame (NULL).
    */
  def webpAnimCorpus(docs: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.graftnative.NativeColumns.syntheticWebp
    val id = col(idCol).cast("long")
    val base = docs.select(
      id.as("media_id"),
      when(id >= 20 && pmod(id, lit(13)) === 0, syntheticWebp(id, "animtrunc"))
        .otherwise(syntheticWebp(id, "base")).as("payload"))
    val rewrap = docs.filter(id < 20).select(
      (id + 100000L).as("media_id"), syntheticWebp(id, "anim").as("payload"))
    val convLossy = docs.filter(id < 10).select(
      (id + 200000L).as("media_id"), syntheticWebp(id, "animlossy").as("payload"))
    base.unionByName(rewrap).unionByName(convLossy)
  }

  /** WebP pixel-level fingerprint projection: `(media_id, pxhash)` via
    * the codegen'd [[graft.functions.expressions.WebpPixelHash]] — NULL
    * for anything not cleanly decodable. Zero-shuffle.
    */
  def webpHash(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame =
    media.select(
      col(idCol).cast("long").as("media_id"),
      org.apache.spark.sql.graftnative.NativeColumns
        .webpPixelHash(col(payloadCol)).as("pxhash"))

  /** WebP pixel-level near-dup pairs — [[webpHash]] through the same
    * pigeonhole banding + exact Hamming verify as [[pixelPairs]].
    */
  def webpPairs(
      media: DataFrame,
      maxHamming: Int = 2,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      boundary: Boundary = Boundary.Local): DataFrame =
    Dedup.hammingPairs64(
      webpHash(media, idCol, payloadCol)
        .filter(col("pxhash").isNotNull)
        .withColumnRenamed("media_id", "doc_id"),
      "pxhash", maxHamming, boundary)
      .select(col("doc_id_1").as("media_id_1"), col("doc_id_2").as("media_id_2"),
        col("hamming"))

  /** WebP pixel pairs → connected components → keep/drop for EVERY input
    * row (undecodable rows are singletons).
    */
  def webpClusters(
      media: DataFrame,
      maxHamming: Int = 2,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      boundary: Boundary = Boundary.Local): DataFrame = {
    val pairs = webpPairs(media, maxHamming, idCol, payloadCol, boundary)
    val comp = Dedup.connectedComponents(pairs, "media_id_1", "media_id_2")
    media.select(col(idCol).cast("long").as("media_id"))
      .join(comp.withColumnRenamed("node", "media_id"), Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("cluster"), col("media_id")).as("component"),
        (coalesce(col("cluster"), col("media_id")) === col("media_id")).as("keep"))
  }

  /** Deterministic FULLY-DECODABLE synthetic MJPEG-in-AVI clips with
    * planted RE-CONTAINER twins — the VIDEO leg of the content family
    * ([[graft.functions.expressions.SyntheticAvi]]): real RIFF/AVI
    * containers whose frames are [[graft.functions.expressions
    * .JpegFixture]] baseline streams, so the poster frame rides the
    * production JPEG decode.
    *
    * Planted twins at `id + 100000`:
    *  - `id < 13`       — REMUX (JUNK chunk, different header fill, a
    *                      text chunk before the first frame, no index:
    *                      near-zero shared container bytes, identical
    *                      poster frame);
    *  - `13 <= id < 25` — RE-ENCODE (every frame losslessly reframed:
    *                      the jpegtran-over-every-frame pass).
    * Both ⇒ poster dHash Hamming EXACTLY 0.
    *
    * Corrupt rows (`id >= 25` only): `%13` torn inside the poster frame,
    * `%17` non-RIFF garbage, `%19` a valid AVI holding only AUDIO chunks
    * — all NULL (they keep the byte-level family).
    */
  def mjpegAviCorpus(docs: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.graftnative.NativeColumns.syntheticAvi
    val id = col(idCol).cast("long")
    val base = docs.select(
      id.as("media_id"),
      when(id >= 25 && pmod(id, lit(13)) === 0, syntheticAvi(id, "truncated"))
        .when(id >= 25 && pmod(id, lit(17)) === 0, syntheticAvi(id, "garbage"))
        .when(id >= 25 && pmod(id, lit(19)) === 0, syntheticAvi(id, "noframes"))
        .otherwise(syntheticAvi(id, "base")).as("payload"))
    val twins = docs.filter(id < 25).select(
      (id + 100000L).as("media_id"),
      when(id < 13, syntheticAvi(id, "remux"))
        .otherwise(syntheticAvi(id, "reenc")).as("payload"))
    base.unionByName(twins)
  }

  /** Video poster-frame fingerprint projection: `(media_id, pxhash)` via
    * the codegen'd [[graft.functions.expressions.AviFrameHash]] — NULL
    * for anything without a decodable baseline-JPEG first frame.
    * Zero-shuffle; reads only up to the first frame.
    */
  def videoHash(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame =
    media.select(
      col(idCol).cast("long").as("media_id"),
      org.apache.spark.sql.graftnative.NativeColumns
        .aviFrameHash(col(payloadCol)).as("pxhash"))

  /** Video poster-frame near-dup pairs — [[videoHash]] through the same
    * pigeonhole banding + exact Hamming verify as [[pixelPairs]].
    */
  def videoPairs(
      media: DataFrame,
      maxHamming: Int = 2,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      boundary: Boundary = Boundary.Local): DataFrame =
    Dedup.hammingPairs64(
      videoHash(media, idCol, payloadCol)
        .filter(col("pxhash").isNotNull)
        .withColumnRenamed("media_id", "doc_id"),
      "pxhash", maxHamming, boundary)
      .select(col("doc_id_1").as("media_id_1"), col("doc_id_2").as("media_id_2"),
        col("hamming"))

  /** Video pairs → connected components → keep/drop for EVERY input row
    * (undecodable rows are singletons).
    */
  def videoClusters(
      media: DataFrame,
      maxHamming: Int = 2,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      boundary: Boundary = Boundary.Local): DataFrame = {
    val pairs = videoPairs(media, maxHamming, idCol, payloadCol, boundary)
    val comp = Dedup.connectedComponents(pairs, "media_id_1", "media_id_2")
    media.select(col(idCol).cast("long").as("media_id"))
      .join(comp.withColumnRenamed("node", "media_id"), Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("cluster"), col("media_id")).as("component"),
        (coalesce(col("cluster"), col("media_id")) === col("media_id")).as("keep"))
  }

  /** Deterministic FULLY-DECODABLE synthetic PCM WAVs with planted
    * RE-ENCODE twins — the AUDIO content near-dup fixture, the
    * [[pixelJpegCorpus]] design carried to sound. Payloads come from the
    * [[graft.functions.expressions.SyntheticWav]] native generator: real
    * RIFF/WAVE streams (canonical chunk walk — WavContentSpec
    * differentially decodes them through `javax.sound.sampled`) over a
    * 65-window md5-derived square-wave envelope per id — envelope steps
    * large enough that every planted re-encode lands at Hamming EXACTLY
    * 0, random across ids so non-twin hashes sit ~32 bits apart.
    *
    * Planted twins at `id + 100000`:
    *  - `id < 9`        — GAIN re-encode (every sample exactly halved:
    *                      the volume-normalized duplicate);
    *  - `9 <= id < 17`  — PAD remux (500 zero samples each side + a
    *                      LIST/INFO chunk: the silence-padded export);
    *  - `17 <= id < 25` — QUANT8 re-encode (16→8-bit PCM: the
    *                      bit-depth-reduced duplicate).
    * And at `id + 200000` for `id < 8` — the STEREO remux (the signal
    * duplicated into 2 channels; the mixdown recovers it), which also
    * pairs with the gain twin of the same id.
    *
    * Corrupt rows (`id >= 25` only, twin bases stay valid): `%13` torn
    * mid-data (NULL, never throw), `%17` non-RIFF garbage, `%19` an
    * IEEE-FLOAT-tagged container the integer-PCM decoder must cleanly
    * reject — those rows stay covered by the byte-level family.
    */
  def pcmWavCorpus(docs: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.graftnative.NativeColumns.syntheticWav
    val id = col(idCol).cast("long")
    val base = docs.select(
      id.as("media_id"),
      when(id >= 25 && pmod(id, lit(13)) === 0, syntheticWav(id, "truncated"))
        .when(id >= 25 && pmod(id, lit(17)) === 0, syntheticWav(id, "garbage"))
        .when(id >= 25 && pmod(id, lit(19)) === 0, syntheticWav(id, "float32"))
        .otherwise(syntheticWav(id, "base")).as("payload"))
    val twins = docs.filter(id < 25).select(
      (id + 100000L).as("media_id"),
      when(id < 9, syntheticWav(id, "gain"))
        .when(id < 17, syntheticWav(id, "pad"))
        .otherwise(syntheticWav(id, "quant8")).as("payload"))
    val stereoTwins = docs.filter(id < 8).select(
      (id + 200000L).as("media_id"), syntheticWav(id, "stereo").as("payload"))
    base.unionByName(twins).unionByName(stereoTwins)
  }

  /** Audio content-fingerprint projection: `(media_id, awhash)` via the
    * codegen'd [[graft.functions.expressions.WavContentHash]] — NULL for
    * anything not cleanly-decodable integer PCM (those rows keep the
    * byte-level [[perceptualHash]] family). Zero-shuffle: only the
    * 8-byte hash flows downstream.
    */
  def audioHash(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame =
    media.select(
      col(idCol).cast("long").as("media_id"),
      org.apache.spark.sql.graftnative.NativeColumns
        .wavContentHash(col(payloadCol)).as("awhash"))

  /** Audio content near-dup pairs — [[audioHash]] through the same
    * pigeonhole banding + exact Hamming verify as [[pixelPairs]]. Output
    * `(media_id_1 < media_id_2, hamming)`.
    */
  def audioPairs(
      media: DataFrame,
      maxHamming: Int = 2,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      boundary: Boundary = Boundary.Local): DataFrame =
    Dedup.hammingPairs64(
      audioHash(media, idCol, payloadCol)
        .filter(col("awhash").isNotNull)
        .withColumnRenamed("media_id", "doc_id"),
      "awhash", maxHamming, boundary)
      .select(col("doc_id_1").as("media_id_1"), col("doc_id_2").as("media_id_2"),
        col("hamming"))

  /** Audio pairs → connected components → keep/drop for EVERY input row
    * (undecodable rows are singletons) — [[pixelClusters]] with the audio
    * fingerprint.
    */
  def audioClusters(
      media: DataFrame,
      maxHamming: Int = 2,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      boundary: Boundary = Boundary.Local): DataFrame = {
    val pairs = audioPairs(media, maxHamming, idCol, payloadCol, boundary)
    val comp = Dedup.connectedComponents(pairs, "media_id_1", "media_id_2")
    media.select(col(idCol).cast("long").as("media_id"))
      .join(comp.withColumnRenamed("node", "media_id"), Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("cluster"), col("media_id")).as("component"),
        (coalesce(col("cluster"), col("media_id")) === col("media_id")).as("keep"))
  }

  /** CROSS-CONTAINER audio corpus — WAV originals with FLAC twins: the
    * archive keeps the lossless .flac master, the crawl serves the .wav
    * (or vice versa); identical samples, zero shared bytes. Twins at
    * `id + 100000`: `id < 9` a mono FLAC encode (mixed
    * VERBATIM/FIXED/LPC subframes), `9 <= id < 17` a MID/SIDE stereo
    * FLAC, `17 <= id < 25` a LEFT/SIDE stereo FLAC — all of the SAME
    * [[graft.functions.expressions.WavFixture]] signal, so every pair
    * lands at Hamming EXACTLY 0 across formats. Corrupt rows
    * (`id >= 25`): `%13` torn FLAC, `%17` garbage — NULL, byte family.
    */
  def crossAudioCorpus(docs: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.graftnative.NativeColumns.{syntheticFlac, syntheticWav}
    val id = col(idCol).cast("long")
    val base = docs.select(
      id.as("media_id"),
      when(id >= 25 && pmod(id, lit(13)) === 0, syntheticFlac(id, "truncated"))
        .when(id >= 25 && pmod(id, lit(17)) === 0, syntheticFlac(id, "garbage"))
        .otherwise(syntheticWav(id, "base")).as("payload"))
    val twins = docs.filter(id < 25).select(
      (id + 100000L).as("media_id"),
      when(id < 9, syntheticFlac(id, "flac"))
        .when(id < 17, syntheticFlac(id, "ms"))
        .otherwise(syntheticFlac(id, "ls")).as("payload"))
    base.unionByName(twins)
  }

  /** Container-agnostic audio content fingerprint: the WAV envelope hash
    * where the payload is RIFF/WAVE, the FLAC decode's (identical
    * envelope contract) where it is FLAC — one column, so WAV↔FLAC
    * duplicates meet in the same banded pair space. Zero-shuffle.
    */
  def crossAudioHash(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    import org.apache.spark.sql.graftnative.NativeColumns.{flacContentHash, wavContentHash}
    media.select(
      col(idCol).cast("long").as("media_id"),
      coalesce(wavContentHash(col(payloadCol)),
        flacContentHash(col(payloadCol))).as("awhash"))
  }

  /** Cross-container audio near-dup pairs — [[crossAudioHash]] through
    * the same banded machinery as [[audioPairs]].
    */
  def crossAudioPairs(
      media: DataFrame,
      maxHamming: Int = 2,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      boundary: Boundary = Boundary.Local): DataFrame =
    Dedup.hammingPairs64(
      crossAudioHash(media, idCol, payloadCol)
        .filter(col("awhash").isNotNull)
        .withColumnRenamed("media_id", "doc_id"),
      "awhash", maxHamming, boundary)
      .select(col("doc_id_1").as("media_id_1"), col("doc_id_2").as("media_id_2"),
        col("hamming"))

  /** Cross-container audio pairs → connected components → keep/drop. */
  def crossAudioClusters(
      media: DataFrame,
      maxHamming: Int = 2,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      boundary: Boundary = Boundary.Local): DataFrame = {
    val pairs = crossAudioPairs(media, maxHamming, idCol, payloadCol, boundary)
    val comp = Dedup.connectedComponents(pairs, "media_id_1", "media_id_2")
    media.select(col(idCol).cast("long").as("media_id"))
      .join(comp.withColumnRenamed("node", "media_id"), Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("cluster"), col("media_id")).as("component"),
        (coalesce(col("cluster"), col("media_id")) === col("media_id")).as("keep"))
  }

  /** Per-media 64-bit perceptual fingerprint over the payload bytes —
    * `(media_id, phash)` via the codegen'd
    * [[graft.functions.expressions.BlockHash64]] (block-mean vs
    * whole-mean bits, exact integer math). Zero-shuffle projection: the
    * payload never moves, only the 8-byte hash flows downstream. Null
    * payloads hash as empty (0L), matching the decode-stats convention.
    *
    * On real media the input would be the decoded pixel/sample plane from
    * the [[decodeStub]] seam; the fingerprint math is byte-source-agnostic,
    * which is exactly what makes it testable here without a codec.
    */
  def perceptualHash(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame =
    media.select(
      col(idCol).cast("long").as("media_id"),
      org.apache.spark.sql.graftnative.NativeColumns
        .blockHash64(coalesce(col(payloadCol), lit(Array.emptyByteArray)))
        .as("phash"))

  /** Content near-dup pairs over a multimodal corpus: perceptual
    * fingerprint -> pigeonhole chunk banding -> exact Hamming verify —
    * the [[Dedup.hammingPairs64]] machinery fed by [[perceptualHash]].
    * Output `(media_id_1 < media_id_2, hamming)`, hamming <= maxHamming.
    *
    * Scale shape: identical to SimHash near-dup — the corpus is reduced to
    * (id, 8-byte hash) before anything shuffles, candidates come from
    * equi-joins on chunk values (never a cross product), recall is 100% by
    * the pigeonhole bound.
    */
  def perceptualPairs(
      media: DataFrame,
      maxHamming: Int = 6,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      boundary: Boundary = Boundary.Local): DataFrame =
    Dedup.hammingPairs64(
      perceptualHash(media, idCol, payloadCol).withColumnRenamed("media_id", "doc_id"),
      "phash", maxHamming, boundary)
      .select(col("doc_id_1").as("media_id_1"), col("doc_id_2").as("media_id_2"),
        col("hamming"))

  /** Pairs -> clusters: resolve the perceptual near-dup pair graph through
    * [[Dedup.connectedComponents]] and emit `(media_id, component, keep)`
    * for EVERY input row — singletons keep themselves, each component
    * keeps its minimum id (the same keep rule as [[Dedup.semanticDedup]]).
    */
  def perceptualClusters(
      media: DataFrame,
      maxHamming: Int = 6,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      boundary: Boundary = Boundary.Local): DataFrame = {
    val pairs = perceptualPairs(media, maxHamming, idCol, payloadCol, boundary)
    val comp = Dedup.connectedComponents(pairs, "media_id_1", "media_id_2")
    media.select(col(idCol).cast("long").as("media_id"))
      .join(comp.withColumnRenamed("node", "media_id"), Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("cluster"), col("media_id")).as("component"),
        (coalesce(col("cluster"), col("media_id")) === col("media_id")).as("keep"))
  }

  /** Decoded-feature schema produced by [[decodeStub]]. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType), nullable = false)))

  /** Catalyst-native decode: the same deterministic byte math as
    * [[decodeStub]] (checksum = unsigned byte sum, frame count from length,
    * 8-dim evenly-sampled feature) as ONE codegen'd expression
    * ([[graft.functions.expressions.DecodeStats]]) — so the decode step
    * stays inside WholeStageCodegen and upstream column pruning survives
    * (the RDD stub severs Catalyst: no pruning above it, no codegen through
    * it). This is the path the registry query runs; [[decodeStub]] remains
    * the documented seam for a REAL codec, which genuinely needs the
    * per-partition batch shape a JNI/FFI library wants. Null payloads
    * decode as empty (byte_len 0, zero feature), matching the stub.
    */
  def decode(media: DataFrame): DataFrame = {
    val stats = org.apache.spark.sql.graftnative.NativeColumns
      .decodeStats(coalesce(col("payload"), lit(Array.emptyByteArray)))
    media.select(col("media_id"), col("modality"), stats.as("__s"))
      .select(col("media_id"), col("modality"),
        col("__s.byte_len").as("byte_len"),
        col("__s.checksum").as("checksum"),
        col("__s.n_frames").as("n_frames"),
        col("__s.feature").as("feature"))
  }

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

  /** Schema produced by [[resizeStub]]. */
  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** STUB resize — the other codec seam. A real implementation decodes
    * pixels and interpolates; the deterministic fake nearest-neighbor-
    * samples the raw bytes down to `outW*outH` so the output size contract
    * (payload length = width*height) and the per-partition batch shape are
    * real and testable. Like [[decodeStub]], runs one `mapPartitions` pass
    * and emits payloads no larger than the target, so downstream shuffles
    * move only resized data.
    */
  def resizeStub(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0, "target dimensions must be positive")
    val spark = media.sparkSession
    val outLen = outW * outH
    val rdd = media.select("media_id", "modality", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = Option(r.getAs[Array[Byte]](2)).getOrElse(Array.emptyByteArray)
        val resized =
          if (bytes.isEmpty) new Array[Byte](outLen)
          else Array.tabulate(outLen)(i => bytes((i.toLong * bytes.length / outLen).toInt))
        Row(r.getLong(0), r.getString(1), outW, outH, resized)
      }
    }
    spark.createDataFrame(rdd, resizedSchema)
  }
}
