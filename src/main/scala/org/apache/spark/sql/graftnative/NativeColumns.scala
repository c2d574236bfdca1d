package org.apache.spark.sql.graftnative

import graft.functions.expressions.{BlockHash64, BloomProbe, BroadcastBloom, DecodeStats, DotProduct, HyperplaneBuckets, ImageDims, MinHashWordsSig, NfcNormalize, NormalizeVec, QuantizeInt8, SimHashWords, TopKByScore, WavMeta}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.{ExpressionColumnNode, ExpressionUtils}

/** Column-API bridge for graft's native Catalyst expressions.
  *
  * Lives under `org.apache.spark.sql` because the Spark-Connect-era
  * `Column`/`ColumnNode` indirection is `private[sql]` — this is the
  * standard extension-library escape hatch for wrapping a custom
  * `Expression` into a `Column` on the classic execution path.
  */
object NativeColumns {

  /** Codegen'd dot product over array<float>/array<double> columns —
    * drop-in for the interpreted `aggregate(zip_with(...))` fold with
    * identical IEEE-754 semantics (see [[DotProduct]]).
    */
  def dot(a: Column, b: Column): Column =
    Column(ExpressionColumnNode(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b))))

  /** Codegen'd banded hyperplane-LSH buckets (array<int>, one int bucket
    * per band) — drop-in for the per-plane interpreted folds with identical
    * arithmetic (see [[HyperplaneBuckets]]).
    */
  def hyperplaneBuckets(vec: Column, bands: Int, planesPerBand: Int): Column =
    Column(ExpressionColumnNode(
      HyperplaneBuckets(ExpressionUtils.expression(vec), bands, planesPerBand)))

  /** Per-row MinHash signature straight from an array<string> words column:
    * shingling + hashing + K minima in one pass, no explode/shuffle/HOF
    * (see [[MinHashWordsSig]]).
    */
  def minhashWordsSig(
      words: Column, n: Int, md5: Boolean,
      as: Seq[Long], bs: Seq[Long], p: Long): Column =
    Column(ExpressionColumnNode(
      MinHashWordsSig(ExpressionUtils.expression(words), n, md5, as, bs, p)))

  /** Per-row 64-bit SimHash from an array<string> words column: token
    * hashing + all 64 bit votes in one pass, no explode/shuffle/HOF
    * (see [[SimHashWords]]).
    */
  def simhashWords(words: Column, md5: Boolean): Column =
    Column(ExpressionColumnNode(
      SimHashWords(ExpressionUtils.expression(words), md5)))

  /** L2 normalization as one codegen'd two-pass loop — zero vectors map
    * to zeros, no per-element norm re-evaluation (see [[NormalizeVec]]).
    */
  def l2Normalize(vec: Column): Column =
    Column(ExpressionColumnNode(NormalizeVec(ExpressionUtils.expression(vec))))

  /** Unicode NFC normalization of a string column — combining sequences
    * compose to their canonical form so byte-level hashing/dedup sees
    * canonically-equal text as equal; all-ASCII rows take a scan-only
    * fast path (see [[NfcNormalize]]).
    */
  def nfcNormalize(s: Column): Column =
    Column(ExpressionColumnNode(NfcNormalize(ExpressionUtils.expression(s))))

  /** Decode HTML numeric character references (`&#8217;` / `&#x2019;`) —
    * the entity family a regexp_replace chain cannot express; invalid
    * references pass through verbatim (see
    * [[graft.functions.expressions.DecodeNumericRefs]]).
    */
  def decodeNumericRefs(s: Column): Column =
    Column(ExpressionColumnNode(
      graft.functions.expressions.DecodeNumericRefs(ExpressionUtils.expression(s))))

  /** Greedy longest-match subword tokenization of an array<string> words
    * column against a trained vocab: struct(n_tokens, id_checksum, ids) in
    * one per-row pass — no shuffle, no join, no HOF (see
    * [[graft.functions.expressions.BpeTokenize]]).
    */
  def bpeTokenize(words: Column, vocab: Seq[(String, Int)], maxLen: Int): Column =
    Column(ExpressionColumnNode(
      graft.functions.expressions.BpeTokenize(
        ExpressionUtils.expression(words), vocab, maxLen)))

  /** BYTE-LEVEL BPE apply (GPT-2 family): regex pretokenization, UTF-8
    * bytes as the fallback alphabet (no unknowns), trained merges in
    * rank order — struct(n_tokens, id_checksum, ids), one per-row pass
    * (see [[graft.functions.expressions.ByteBpeTokenize]]).
    */
  def byteBpeTokenize(text: Column, merges: Seq[(String, String)]): Column =
    Column(ExpressionColumnNode(
      graft.functions.expressions.ByteBpeTokenize(
        ExpressionUtils.expression(text), merges)))

  /** Unigram-LM (SentencePiece-family) tokenizer apply: Viterbi
    * minimum-cost segmentation under integer millibit costs, ties to the
    * longer token (see [[graft.functions.expressions.UnigramTokenize]]) —
    * the cost-model sibling of [[bpeTokenize]]'s greedy longest-match.
    */
  def unigramTokenize(words: Column, model: Seq[(String, Int, Long)], maxLen: Int): Column =
    Column(ExpressionColumnNode(
      graft.functions.expressions.UnigramTokenize(
        ExpressionUtils.expression(words), model, maxLen)))

  /** Per-vector symmetric int8 quantization (max-abs scaling, round half
    * toward +inf) as one codegen'd two-pass loop (see [[QuantizeInt8]]).
    */
  def quantizeInt8(vec: Column): Column =
    Column(ExpressionColumnNode(QuantizeInt8(ExpressionUtils.expression(vec))))

  /** Map-side-combined bounded top-k aggregate: array of (score, id)
    * structs, best first (see [[TopKByScore]]).
    */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    Column(ExpressionColumnNode(
      TopKByScore(ExpressionUtils.expression(score), ExpressionUtils.expression(id), k)
        .toAggregateExpression()))

  /** PNG/JPEG header sniff over a binary payload column:
    * `struct<format, width, height>`, NULL for unparseable bytes (see
    * [[ImageDims]] — a real IHDR read and JPEG segment walk, codegen'd).
    */
  def imageDims(payload: Column): Column =
    Column(ExpressionColumnNode(ImageDims(ExpressionUtils.expression(payload))))

  /** Deterministic byte-level decode stats over a binary payload column:
    * `struct<byte_len, checksum, n_frames, feature>` in one codegen'd pass
    * (see [[DecodeStats]] — the registry-path replacement for the RDD
    * decode stub's fake metadata).
    */
  def decodeStats(payload: Column): Column =
    Column(ExpressionColumnNode(DecodeStats(ExpressionUtils.expression(payload))))

  /** 64-bit perceptual block hash over a binary payload column — block-mean
    * vs whole-payload-mean bits, exact integer math (see [[BlockHash64]]);
    * the content fingerprint feeding multimodal near-dup.
    */
  def blockHash64(payload: Column): Column =
    Column(ExpressionColumnNode(BlockHash64(ExpressionUtils.expression(payload))))

  /** PIXEL-LEVEL 64-bit dHash for PNG payloads: deterministic zlib
    * inflate + unfilter + integer-luma 9×8 box downsample + gradient
    * bits; NULL for anything not a cleanly-decodable 8-bit PNG (see
    * [[graft.functions.expressions.PngPixelHash]]). Re-encoded images —
    * same pixels, different byte stream — hash identically, the case the
    * byte-level [[blockHash64]] provably misses.
    */
  def pngPixelHash(payload: Column): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.PngPixelHash(
      ExpressionUtils.expression(payload))))

  /** PIXEL-LEVEL 64-bit dHash for BASELINE JPEG payloads: marker-stream
    * parse + Huffman decode + deterministic fixed-point integer IDCT of
    * the LUMA plane (chroma advanced, never reconstructed) + the same 9×8
    * gradient bits; NULL for progressive/arithmetic/12-bit/truncated
    * streams (see [[graft.functions.expressions.JpegPixelHash]]). Lands
    * the requantized/reframed re-encode duplicates [[blockHash64]]
    * provably misses in the dominant crawl image format.
    */
  def jpegPixelHash(payload: Column): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.JpegPixelHash(
      ExpressionUtils.expression(payload))))

  /** Deterministic synthetic baseline-JPEG generator over a long id column
    * (fixture corpora only — see
    * [[graft.functions.expressions.SyntheticJpeg]] for the variants).
    */
  def syntheticJpeg(id: Column, mode: String): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.SyntheticJpeg(
      ExpressionUtils.expression(id), mode)))

  /** 2-D Hilbert-curve index of two long columns on a `2^bits` grid — the
    * tighter-locality alternative to the Morton interleave for at-rest
    * layout (see [[graft.functions.expressions.HilbertIndex2D]]).
    */
  def hilbert2D(x: Column, y: Column, bits: Int): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.HilbertIndex2D(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y), bits)))

  /** WARC (ISO 28500, the Common Crawl container) record parser over a
    * binary payload column:
    * `array<struct<warc_type, target_uri, content_type, content_length, body>>`,
    * Content-LENGTH-driven (binary-safe bodies — a body containing the
    * record separator parses correctly where regex splitting is wrong);
    * NULL on ANY malformation, never a partial parse (see
    * [[graft.functions.expressions.WarcRecords]]). A shard ingest is
    * `explode(warcRecords(payload))`.
    */
  def warcRecords(payload: Column): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.WarcRecords(
      ExpressionUtils.expression(payload))))

  /** VIDEO POSTER-FRAME 64-bit dHash for MJPEG-in-AVI payloads: RIFF/AVI
    * walk to the first `##dc`/`##db` frame, then the full baseline-JPEG
    * decode ([[jpegPixelHash]]); NULL for torn containers, frame-less
    * movi lists, or frames the JPEG decoder rejects (see
    * [[graft.functions.expressions.AviFrameHash]]). Lands the remuxed /
    * losslessly-re-encoded clip duplicates [[blockHash64]] provably
    * misses.
    */
  def aviFrameHash(payload: Column): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.AviFrameHash(
      ExpressionUtils.expression(payload))))

  /** Deterministic synthetic MJPEG-in-AVI generator over a long id column
    * (fixture corpora only — see [[graft.functions.expressions.SyntheticAvi]]).
    */
  def syntheticAvi(id: Column, mode: String): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.SyntheticAvi(
      ExpressionUtils.expression(id), mode)))

  /** PIXEL-LEVEL 64-bit dHash for GIF payloads: container walk + GIF-LZW
    * decode of the first frame (variable code width, clear/EOI, deferred
    * dictionary) + de-interlace + palette-to-luma + the same 9×8 gradient
    * bits as the PNG/JPEG decoders; NULL for anything not cleanly
    * decodable (see [[graft.functions.expressions.GifPixelHash]]). Lands
    * the reblocked/palette-permuted/interlaced re-encode duplicates
    * [[blockHash64]] provably misses.
    */
  def gifPixelHash(payload: Column): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.GifPixelHash(
      ExpressionUtils.expression(payload))))

  /** Deterministic synthetic GIF generator over a long id column (fixture
    * corpora only — see [[graft.functions.expressions.SyntheticGif]]).
    */
  def syntheticGif(id: Column, mode: String): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.SyntheticGif(
      ExpressionUtils.expression(id), mode)))

  /** PIXEL-LEVEL 64-bit dHash for WebP-lossless (VP8L) payloads: RIFF
    * walk (simple or VP8X-extended) + full VP8L decode (canonical prefix
    * codes, meta-prefix images, LZ77 with the 2-D distance map, color
    * cache, all four transforms incl. bundled palettes) + luma + the same
    * 9×8 gradient bits as the PNG/JPEG/GIF decoders; NULL for anything
    * not cleanly decodable — lossy `VP8 ` payloads stay on the byte-level
    * [[blockHash64]] family (see
    * [[graft.functions.expressions.WebpPixelHash]]). Lands the
    * CDN-re-encode duplicates (different predictor set / palettization /
    * cache / LZ77 choices) byte fingerprints provably miss.
    */
  def webpPixelHash(payload: Column): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.WebpPixelHash(
      ExpressionUtils.expression(payload))))

  /** Deterministic synthetic VP8L WebP generator over a long id column
    * (fixture corpora only — see [[graft.functions.expressions.SyntheticWebp]]).
    */
  def syntheticWebp(id: Column, mode: String): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.SyntheticWebp(
      ExpressionUtils.expression(id), mode)))

  /** CONTENT-LEVEL 64-bit envelope fingerprint for PCM WAV payloads:
    * real RIFF chunk walk + 8/16-bit mono/stereo PCM decode + silence
    * trim + 65-window |sample| envelope + gradient bits; NULL for
    * anything not cleanly-decodable integer PCM (see
    * [[graft.functions.expressions.WavContentHash]]). Lands the
    * volume-normalized / silence-padded / bit-depth-reduced / remuxed
    * audio duplicates [[blockHash64]] provably misses.
    */
  def wavContentHash(payload: Column): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.WavContentHash(
      ExpressionUtils.expression(payload))))

  /** CONTENT-LEVEL 64-bit envelope fingerprint for FLAC payloads: native
    * FLAC decode (CONSTANT/VERBATIM/FIXED/LPC subframes, Rice/Rice2
    * residuals, wasted bits, left-side/right-side/mid-side stereo) +
    * the SAME trim/65-window envelope as [[wavContentHash]] — a FLAC
    * encode of a WAV hashes at Hamming 0 against the WAV original (the
    * cross-container duplicate class). NULL for anything not cleanly
    * decodable; MP3/AAC stay on the byte-level family (see
    * [[graft.functions.expressions.FlacContentHash]]).
    */
  def flacContentHash(payload: Column): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.FlacContentHash(
      ExpressionUtils.expression(payload))))

  /** Deterministic synthetic FLAC generator over a long id column
    * (fixture corpora only — see [[graft.functions.expressions.SyntheticFlac]]).
    */
  def syntheticFlac(id: Column, mode: String): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.SyntheticFlac(
      ExpressionUtils.expression(id), mode)))

  /** PDF text extraction: full xref walk — classic xref sections AND
    * PDF-1.5 cross-reference streams / object streams (`/W`, `/Index`,
    * TIFF + PNG predictors) — then Catalog → Pages → Contents,
    * FlateDecode, and the BT/ET text operators (`Tj`/`TJ`/`'`/`"`,
    * `Td`/`TD`/`T*` line breaks, full string-escape set, hex strings) —
    * the `application/pdf` leg of the crawl-ingestion pipeline. NULL for
    * anything not cleanly walkable (non-Flate stream filters, CID/Type0
    * encoded text, malformed xref) — see
    * [[graft.functions.expressions.PdfText]].
    */
  def pdfText(payload: Column): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.PdfText(
      ExpressionUtils.expression(payload))))

  /** DOCX text extraction: ZIP central-directory walk (EOCD → entries →
    * local headers, STORED + DEFLATE with CRC verify) to
    * `word/document.xml`, then WordprocessingML reduced to text — the
    * office-document leg of the crawl extraction chain. NULL for
    * anything not cleanly walkable — see
    * [[graft.functions.expressions.DocxText]].
    */
  def docxText(payload: Column): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.DocxText(
      ExpressionUtils.expression(payload))))

  /** HTTP/1.1 chunked transfer-coding reassembly (RFC 9112 §7.1) over
    * body bytes — the raw-capture leg of the crawl extraction chain
    * (WARC response payloads often keep the transfer coding). NULL on
    * any framing violation — see
    * [[graft.functions.expressions.HttpChunkedDecode]].
    */
  def httpUnchunk(body: Column): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.HttpChunkedDecode(
      ExpressionUtils.expression(body))))

  /** Deterministic synthetic DOCX generator over a long id column
    * (fixture corpora only — see
    * [[graft.functions.expressions.DocxFixture]]).
    */
  def syntheticDocx(id: Column, mode: String): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.SyntheticDocx(
      ExpressionUtils.expression(id), mode)))

  /** Deterministic synthetic PDF generator over a long id column
    * (fixture corpora only — see [[graft.functions.expressions.SyntheticPdf]]).
    */
  def syntheticPdf(id: Column, mode: String): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.SyntheticPdf(
      ExpressionUtils.expression(id), mode)))

  /** Deterministic synthetic PCM-WAV generator over a long id column
    * (fixture corpora only — see
    * [[graft.functions.expressions.SyntheticWav]] for the variants).
    */
  def syntheticWav(id: Column, mode: String): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.SyntheticWav(
      ExpressionUtils.expression(id), mode)))

  /** RIFF/WAVE header sniff over a binary payload column:
    * `struct<sample_rate, channels, bits, duration_ms>`, NULL for
    * unparseable bytes (see [[WavMeta]] — a real little-endian chunk walk,
    * codegen'd).
    */
  def wavMeta(payload: Column): Column =
    Column(ExpressionColumnNode(WavMeta(ExpressionUtils.expression(payload))))

  /** ISO-BMFF (MP4/MOV) container sniff over a binary payload column:
    * `struct<brand, timescale, duration, duration_ms>`, NULL for
    * unparseable bytes (see [[graft.functions.expressions.Mp4Meta]] — a
    * real big-endian box walk with largesize and mvhd v0/v1 support,
    * codegen'd).
    */
  def mp4Meta(payload: Column): Column =
    Column(ExpressionColumnNode(graft.functions.expressions.Mp4Meta(
      ExpressionUtils.expression(payload))))

  /** Spark's own runtime-filter bloom aggregate (the engine behind
    * `spark.sql.optimizer.runtime.bloomFilter.*`), exposed as a Column:
    * builds a serialized bloom filter (binary) over `hash` (pass
    * `xxhash64(key)` — the same keying the runtime filter uses). Partial
    * filters OR-merge map-side, so the build is one tree-reduced pass.
    */
  def bloomFilterAgg(hash: Column, expectedItems: Long, numBits: Long): Column =
    Column(ExpressionColumnNode(
      new BloomFilterAggregate(
        ExpressionUtils.expression(hash),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression()))

  /** Membership probe against a [[bloomFilterAgg]] result. `bloom` must be
    * constant-foldable (a literal or scalar-subquery result — exactly how
    * Spark's injected runtime filters carry it). False positives possible,
    * false negatives never. NOTE: the literal serializes into every task
    * closure — use [[mightContainBroadcast]] for filters beyond a few MB.
    */
  def mightContain(bloom: Column, hash: Column): Column =
    Column(ExpressionColumnNode(
      BloomFilterMightContain(
        ExpressionUtils.expression(bloom), ExpressionUtils.expression(hash))))

  /** Wrap a (resolved) custom LogicalPlan as a DataFrame on `df`'s
    * session — `Dataset.ofRows` is `private[sql]`, the same escape hatch
    * as the Column bridge above. Used by whole-operator plans
    * (e.g. [[graft.plans.AsOfMergeJoinNode]]).
    */
  def ofRows(
      df: org.apache.spark.sql.DataFrame,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** [[mightContain]] with the filter carried as a BROADCAST VARIABLE:
    * bytes ship once per executor (torrent), deserialize once, and the
    * plan/task closures carry only the handle — the scale form for the
    * multi-hundred-MB filters a corpus-ingest dedup builds
    * (see [[BloomProbe]]).
    */
  def mightContainBroadcast(bloom: Broadcast[Array[Byte]], hash: Column): Column =
    Column(ExpressionColumnNode(
      BloomProbe(new BroadcastBloom(bloom), ExpressionUtils.expression(hash))))
}
