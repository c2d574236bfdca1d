package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** VIDEO POSTER-FRAME content identity for MJPEG-in-AVI payloads — the
  * video leg of the content-identity family: walk the RIFF/AVI container
  * (LIST chains, header lists skipped) to the `movi` list, take the FIRST
  * video frame chunk (`##dc`/`##db`) that starts with a JPEG SOI, and
  * hash it through the full [[JpegPixelHash]] decode (Huffman + integer
  * IDCT + EXIF normalization + 9×8 dHash). A video's dedup identity is
  * its poster frame: the common crawl duplicates — the same clip REMUXED
  * (different chunk layout, padding, index, header junk) or with its
  * frames LOSSLESSLY re-encoded — keep the same decoded first frame and
  * land at Hamming 0, while the byte-level [[BlockHash64]] provably
  * misses both (the containers share almost no bytes).
  *
  * Returns NULL for anything that is not cleanly a RIFF/AVI with a
  * decodable baseline-JPEG first frame: wrong signature, torn lists or
  * chunks, an empty `movi`, non-JPEG frame data (most real MJPEG omits
  * Huffman tables — documented unsupported, those rows keep the
  * byte-level family), or a frame [[JpegPixelHash]] rejects. Never
  * throws (fuzzed in AviSpec).
  *
  * Scale: one codegen'd projection reading ONLY up to the first frame —
  * a multi-GB clip costs the container walk plus one JPEG decode; the
  * payload never shuffles.
  */
case class AviFrameHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_frame_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    AviFrameHash.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val impl = ctx.addReferenceObj("aviFrameHashImpl", AviFrameHash,
        AviFrameHash.getClass.getName)
      val tmp = ctx.freshName("avh")
      s"""
        |java.lang.Long $tmp = $impl.hash($v);
        |if ($tmp == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $tmp.longValue(); }
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AviFrameHash =
    copy(child = newChild)
}

object AviFrameHash {

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  /** `##dc` / `##db`: two stream-number digits + compressed/uncompressed
    * video suffix.
    */
  private def isVideoChunk(b: Array[Byte], i: Int): Boolean = {
    val d0 = b(i) >= '0' && b(i) <= '9'
    val d1 = b(i + 1) >= '0' && b(i + 1) <= '9'
    val dc = (b(i + 2) == 'd' && (b(i + 3) == 'c' || b(i + 3) == 'b'))
    d0 && d1 && dc
  }

  def hash(b: Array[Byte]): java.lang.Long =
    try {
      val frame = firstFrame(b)
      if (frame == null) null else JpegPixelHash.hash(frame)
    } catch { case scala.util.control.NonFatal(_) => null }

  /** The first video frame's bytes, or null when the container is not a
    * well-formed AVI holding one. Long cursors: declared sizes near 2^31
    * terminate the walk, never wrap.
    */
  private[expressions] def firstFrame(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 12) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "AVI ")) return null
    var pos = 12L
    while (pos + 8 <= b.length) {
      val ckLen = le32(b, (pos + 4).toInt)
      val body = pos + 8
      if (body + ckLen > b.length) return null // torn chunk
      if (tag(b, pos.toInt, "LIST")) {
        if (ckLen < 4) return null
        if (tag(b, body.toInt, "movi")) {
          // walk the movi sub-chunks for the first video frame
          var sp = body + 4
          val end = body + ckLen
          while (sp + 8 <= end) {
            val subLen = le32(b, (sp + 4).toInt)
            val sbody = sp + 8
            if (sbody + subLen > end) return null // torn sub-chunk
            if (isVideoChunk(b, sp.toInt)) {
              if (subLen < 4) return null
              return java.util.Arrays.copyOfRange(
                b, sbody.toInt, (sbody + subLen).toInt)
            }
            sp = sbody + subLen + (subLen & 1L) // word-aligned
          }
          return null // movi with no video frame
        }
        // a non-movi LIST (hdrl etc.): skip it wholesale
      }
      pos = body + ckLen + (ckLen & 1L)
    }
    null
  }
}
