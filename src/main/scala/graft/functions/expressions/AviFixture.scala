package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Deterministic synthetic MJPEG-in-AVI generator — the video fixture of
  * the content-identity family. Every payload is a REAL RIFF/AVI
  * container (hdrl list with an avih header chunk, movi list with
  * word-aligned `00dc` frame chunks, an idx1 index) whose frames are the
  * [[JpegFixture]] baseline streams — so the poster frame is decodable
  * by the production [[JpegPixelHash]] path and ImageIO alike.
  *
  * Three frames per clip: frame 0 is the POSTER (identity) frame of the
  * clip's id; frames 1–2 derive from salted ids (same clip, different
  * content per frame, as real video has).
  *
  * Variants (`mode`):
  *  - `base`      — canonical layout.
  *  - `remux`     — the SAME frames re-containered: a JUNK chunk before
  *                  hdrl, different avih fill, an extra text chunk inside
  *                  movi BEFORE the first video frame, no idx1 — almost
  *                  no shared container bytes, identical poster frame ⇒
  *                  Hamming EXACTLY 0.
  *  - `reenc`     — every frame losslessly RE-ENCODED ([[JpegFixture]]
  *                  `framing`: new Huffman tables, restarts, no APP0):
  *                  the jpegtran-over-every-frame pass ⇒ Hamming 0.
  *  - `truncated` — torn inside the poster frame (NULL, never throw).
  *  - `garbage`   — not a RIFF at all.
  *  - `noframes`  — a well-formed AVI whose movi holds only audio
  *                  (`01wb`) chunks: a valid container with no video
  *                  frame the decoder must cleanly reject (NULL ⇒ the
  *                  byte-level family keeps covering it).
  */
case class SyntheticAvi(child: Expression, mode: String) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_synthetic_avi"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if AviFixture.Modes.contains(mode) => TypeCheckSuccess
    case LongType => TypeCheckFailure(
      s"$prettyName: unknown mode '$mode' (expected one of ${AviFixture.Modes.mkString(", ")})")
    case dt => TypeCheckFailure(
      s"$prettyName requires a long id argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    AviFixture.build(input.asInstanceOf[Long], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val impl = s"${AviFixture.getClass.getName.stripSuffix("$")}$$.MODULE$$"
      s"${ev.value} = $impl.build($v, \"$mode\");"
    })

  override protected def withNewChildInternal(newChild: Expression): SyntheticAvi =
    copy(child = newChild)
}

object AviFixture {

  val Modes: Set[String] =
    Set("base", "remux", "reenc", "truncated", "garbage", "noframes")

  private def le16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def le32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    le16(out, v & 0xffff); le16(out, (v >> 16) & 0xffff)
  }
  private def fourcc(out: java.io.ByteArrayOutputStream, t: String): Unit =
    out.write(t.getBytes("US-ASCII"))

  private def chunk(t: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    fourcc(out, t); le32(out, data.length)
    out.write(data)
    if ((data.length & 1) == 1) out.write(0) // word alignment pad
    out.toByteArray
  }

  private def list(t: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    fourcc(out, "LIST"); le32(out, 4 + body.length); fourcc(out, t)
    out.write(body)
    out.toByteArray
  }

  /** The clip's three JPEG frames; frame 0 is the poster frame. */
  private def frames(id: Long, reencoded: Boolean): Seq[Array[Byte]] = {
    val mode = if (reencoded) "framing" else "base"
    Seq(
      JpegFixture.build(id, mode),
      JpegFixture.build(id * 31 + 7001, mode),
      JpegFixture.build(id * 31 + 7002, mode))
  }

  private def avih(fill: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    le32(out, 33367) // microseconds per frame (~30fps)
    (1 until 14).foreach(_ => le32(out, fill))
    out.toByteArray // 56 bytes, the avih payload size
  }

  private def container(
      junkFirst: Boolean, fill: Int, textInMovi: Boolean,
      withIdx: Boolean, movChunks: Seq[Array[Byte]]): Array[Byte] = {
    val hdrl = list("hdrl", chunk("avih", avih(fill)))
    val movi = {
      val out = new java.io.ByteArrayOutputStream()
      if (textInMovi)
        out.write(chunk("00tx", "graft-remux".getBytes("US-ASCII")))
      movChunks.foreach(out.write)
      list("movi", out.toByteArray)
    }
    val body = new java.io.ByteArrayOutputStream()
    if (junkFirst) body.write(chunk("JUNK", Array.fill(18)(0x4a.toByte)))
    body.write(hdrl)
    body.write(movi)
    if (withIdx) body.write(chunk("idx1", Array.fill(16)(0.toByte)))
    val out = new java.io.ByteArrayOutputStream()
    fourcc(out, "RIFF"); le32(out, 4 + body.size()); fourcc(out, "AVI ")
    body.writeTo(out)
    out.toByteArray
  }

  def build(id: Long, mode: String): Array[Byte] = mode match {
    case "base" =>
      container(junkFirst = false, fill = 0, textInMovi = false, withIdx = true,
        frames(id, reencoded = false).map(chunk("00dc", _)))
    case "remux" =>
      container(junkFirst = true, fill = 0x7f7f7f, textInMovi = true, withIdx = false,
        frames(id, reencoded = false).map(chunk("00dc", _)))
    case "reenc" =>
      container(junkFirst = false, fill = 0, textInMovi = false, withIdx = true,
        frames(id, reencoded = true).map(chunk("00dc", _)))
    case "truncated" =>
      val full = build(id, "base")
      java.util.Arrays.copyOf(full, full.length / 3) // inside the poster frame
    case "garbage" =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < 16) { out.write(md.digest(s"$id|av$i".getBytes("UTF-8"))); i += 1 }
      out.toByteArray
    case "noframes" =>
      container(junkFirst = false, fill = 0, textInMovi = false, withIdx = true,
        Seq(chunk("01wb", Array.fill(64)(0x55.toByte))))
    case other => throw new IllegalArgumentException(s"unknown SyntheticAvi mode '$other'")
  }
}
