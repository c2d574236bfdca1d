package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PDF TEXT EXTRACTION as a native expression — the second-biggest text
  * source in a real crawl after HTML (`application/pdf` WARC
  * responses): parse the cross-reference from the trailer — BOTH the
  * classic table (`startxref` → `xref` sections → `/Root`, `/Prev`
  * chains for incrementally-updated files) and the PDF-1.5
  * CROSS-REFERENCE STREAM shape (`/W` field widths, `/Index`
  * subsections, FlateDecode with TIFF/PNG `/Predictor` pre-filters —
  * the modern default) with OBJECT STREAMS (`/Type /ObjStm` packed
  * compressed objects) — walk Catalog → Pages → Kids → Page → Contents,
  * FlateDecode the content streams (RFC 1951 — the same deterministic
  * inflate as the PNG decoder), and interpret the text operators: `Tj` / `'` / `"` show strings, `TJ` shows arrays
  * (kerning numbers ignored), `Td`/`TD`/`T*`/`'` break lines, pages
  * join with a newline. String literals decode the full escape set
  * (`\( \) \\ \n \r \t \b \f`, octal, line continuations, balanced
  * nested parens); hex strings decode per spec; simple-font bytes map
  * via Latin-1. CID/Type0 composite fonts (r16 — the embedded-subset
  * shape every modern producer emits): `Tf` tracks the current font
  * through the page's `/Resources /Font` dict, and an
  * Identity-H/V-encoded Type0 font decodes its show strings as 2-byte
  * CID codes through the font's `/ToUnicode` CMap (bfchar + bfrange,
  * incl. the array form; unmapped codes contribute nothing). A Type0
  * font without a parseable ToUnicode has no recoverable text — the
  * document declines to NULL, like every other malformed leg.
  *
  * Returns NULL for anything not cleanly walkable: bad header, missing
  * or malformed xref (table or stream), broken object graph, non-Flate
  * filters, torn streams, or no extractable text — never throws
  * (PdfSpec fuzzes).
  *
  * Scale: one codegen'd projection, O(bytes); the payload never
  * shuffles — only the extracted text flows on, straight into the
  * text-quality/dedup machinery like any HTML extraction.
  */
case class PdfText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pdf_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = PdfText.extract(input.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val impl = ctx.addReferenceObj("pdfTextImpl", PdfText,
        PdfText.getClass.getName)
      val tmp = ctx.freshName("pdt")
      s"""
        |String $tmp = $impl.extract($v);
        |if ($tmp == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($tmp); }
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PdfText =
    copy(child = newChild)
}

object PdfText {

  /** Decompressed-stream ceiling per content stream. */
  val MaxStreamBytes: Int = 1 << 24
  /** Object / page walk ceilings (hostile graphs must terminate). */
  val MaxObjects = 65536
  val MaxPages = 4096

  private object Bad extends RuntimeException with scala.util.control.NoStackTrace
  private def bad(): Nothing = throw Bad

  // ---------------- object model ----------------
  private sealed trait V
  private case class VNum(v: Double) extends V
  private case class VName(v: String) extends V
  private case class VStr(v: Array[Byte]) extends V
  private case class VArr(v: Vector[V]) extends V
  private case class VDict(v: Map[String, V]) extends V
  private case class VRef(num: Int, gen: Int) extends V
  private case object VNull extends V
  private case class VBool(v: Boolean) extends V

  private final class Lexer(val b: Array[Byte], var pos: Int) {
    def ws(): Unit = {
      var go = true
      while (go && pos < b.length) {
        val c = b(pos)
        if (c == ' ' || c == '\r' || c == '\n' || c == '\t' || c == '\f' || c == 0) pos += 1
        else if (c == '%') { // comment to EOL
          while (pos < b.length && b(pos) != '\n' && b(pos) != '\r') pos += 1
        } else go = false
      }
    }
    def peek: Int = if (pos < b.length) b(pos) & 0xff else -1
    def expect(s: String): Unit = {
      ws()
      if (pos + s.length > b.length) bad()
      var i = 0
      while (i < s.length) { if (b(pos + i) != s.charAt(i)) bad(); i += 1 }
      pos += s.length
    }
    def tryKeyword(s: String): Boolean = {
      ws()
      if (pos + s.length > b.length) return false
      var i = 0
      while (i < s.length) { if (b(pos + i) != s.charAt(i)) return false; i += 1 }
      pos += s.length
      true
    }
    def value(depth: Int = 0): V = {
      if (depth > 64) bad()
      ws()
      peek match {
        case -1 => bad()
        case '<' =>
          if (pos + 1 < b.length && b(pos + 1) == '<') { pos += 2; dict(depth) }
          else { pos += 1; hexString() }
        case '(' => pos += 1; literalString()
        case '/' => pos += 1; VName(name())
        case '[' =>
          pos += 1
          var items = Vector.empty[V]
          ws()
          while (peek != ']') { items :+= value(depth + 1); ws(); if (peek == -1) bad() }
          pos += 1
          VArr(items)
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          numberOrRef()
        case 't' => expect("true"); VBool(true)
        case 'f' => expect("false"); VBool(false)
        case 'n' => expect("null"); VNull
        case _ => bad()
      }
    }
    private def dict(depth: Int): V = {
      var m = Map.empty[String, V]
      ws()
      while (!(peek == '>' && pos + 1 < b.length && b(pos + 1) == '>')) {
        if (peek != '/') bad()
        pos += 1
        val k = name()
        m += (k -> value(depth + 1))
        ws()
        if (peek == -1) bad()
      }
      pos += 2
      VDict(m)
    }
    def name(): String = {
      val sb = new StringBuilder
      var go = true
      while (go && pos < b.length) {
        val c = b(pos) & 0xff
        if (c == ' ' || c == '\r' || c == '\n' || c == '\t' || c == '\f' || c == 0 ||
          c == '/' || c == '[' || c == ']' || c == '(' || c == ')' || c == '<' || c == '>' ||
          c == '%') go = false
        else if (c == '#' && pos + 2 < b.length) {
          sb.append(((hexVal(b(pos + 1)) << 4) | hexVal(b(pos + 2))).toChar)
          pos += 3
        } else { sb.append(c.toChar); pos += 1 }
      }
      sb.toString
    }
    private def hexVal(c: Byte): Int = {
      val x = c & 0xff
      if (x >= '0' && x <= '9') x - '0'
      else if (x >= 'a' && x <= 'f') x - 'a' + 10
      else if (x >= 'A' && x <= 'F') x - 'A' + 10
      else bad()
    }
    def hexString(): V = {
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var go = true
      while (go) {
        if (pos >= b.length) bad()
        val c = b(pos) & 0xff
        pos += 1
        if (c == '>') go = false
        else if (c == ' ' || c == '\r' || c == '\n' || c == '\t' || c == '\f' || c == 0) ()
        else {
          val v = hexVal(c.toByte)
          if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 }
        }
      }
      if (hi >= 0) out.write(hi << 4) // odd final digit: low nibble 0
      VStr(out.toByteArray)
    }
    def literalString(): V = {
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (depth > 0) {
        if (pos >= b.length) bad()
        val c = b(pos) & 0xff
        pos += 1
        c match {
          case '(' => depth += 1; out.write('(')
          case ')' => depth -= 1; if (depth > 0) out.write(')')
          case '\\' =>
            if (pos >= b.length) bad()
            val e = b(pos) & 0xff
            pos += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' => out.write('(')
              case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => if (pos < b.length && b(pos) == '\n') pos += 1 // continuation
              case '\n' => () // continuation
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 0
                while (k < 2 && pos < b.length && b(pos) >= '0' && b(pos) <= '7') {
                  v = (v << 3) | (b(pos) - '0'); pos += 1; k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other) // unknown escape: the char itself
            }
          case other => out.write(other)
        }
      }
      VStr(out.toByteArray)
    }
    private def numberOrRef(): V = {
      val start = pos
      val n1 = number()
      // "N G R" is an indirect reference — lookahead for two ints + R
      if (n1 >= 0 && n1 == math.floor(n1)) {
        val save = pos
        ws()
        if (peek >= '0' && peek <= '9') {
          val n2 = number()
          ws()
          if (tryKeyword("R")) return VRef(n1.toInt, n2.toInt)
        }
        pos = save
      }
      val _ = start
      VNum(n1)
    }
    def number(): Double = {
      ws()
      val sb = new StringBuilder
      if (peek == '+' || peek == '-') { sb.append(peek.toChar); pos += 1 }
      var go = true
      while (go && pos < b.length) {
        val c = b(pos) & 0xff
        if ((c >= '0' && c <= '9') || c == '.') { sb.append(c.toChar); pos += 1 }
        else go = false
      }
      if (sb.isEmpty || sb.toString == "+" || sb.toString == "-") bad()
      sb.toString.toDouble
    }
  }

  // ---------------- xref + object resolution ----------------
  private sealed trait Entry
  private final case class Direct(off: Int) extends Entry
  private final case class InStm(stm: Int, idx: Int) extends Entry

  private final class Doc(b: Array[Byte]) {
    // declared BEFORE `offsets`: its initializer assigns the root ref
    var trailerRoot: Option[VRef] = None

    val offsets: Map[Int, Entry] = {
      // startxref from the tail
      val tail = new String(b, math.max(0, b.length - 2048),
        math.min(2048, b.length), "ISO-8859-1")
      val ix = tail.lastIndexOf("startxref")
      if (ix < 0) bad()
      val rest = tail.substring(ix + 9).trim
      val off0 = rest.takeWhile(_.isDigit)
      if (off0.isEmpty) bad()
      var next = off0.toLong
      var acc = Map.empty[Int, Entry]
      var hops = 0
      while (next >= 0 && hops < 8) {
        hops += 1
        if (next > b.length - 4) bad()
        val lx = new Lexer(b, next.toInt)
        // a classic table starts with the keyword `xref`; an OBJECT here
        // is a 1.5+ CROSS-REFERENCE STREAM (also supported)
        val tr: Map[String, V] =
          if (lx.tryKeyword("xref")) {
            var go = true
            while (go) {
              lx.ws()
              if (lx.tryKeyword("trailer")) go = false
              else {
                val start = lx.number().toInt
                val count = lx.number().toInt
                if (count < 0 || count > MaxObjects) bad()
                var i = 0
                while (i < count) {
                  lx.ws()
                  if (lx.pos + 18 > b.length) bad()
                  val entry = new String(b, lx.pos, 18, "ISO-8859-1")
                  val off = entry.substring(0, 10).trim
                  val typ = entry.charAt(17)
                  // first-seen wins across /Prev chains (newest first)
                  if (typ == 'n' && !acc.contains(start + i))
                    acc += ((start + i) -> Direct(off.toInt))
                  lx.pos += 18
                  i += 1
                }
              }
            }
            lx.value() match { case VDict(m) => m; case _ => bad() }
          } else {
            val (dict, entries) = readXrefStream(b, next.toInt)
            entries.foreach { case (num, e) =>
              if (!acc.contains(num)) acc += (num -> e)
            }
            dict
          }
        if (!trailerRoot.isDefined) trailerRoot = tr.get("Root").collect { case r: VRef => r }
        next = tr.get("Prev") match {
          case Some(VNum(p)) => p.toLong
          case _ => -1L
        }
      }
      acc
    }

    /** PDF-1.5 cross-reference stream at `off`: `(stream dict, entries)`.
      * `/W` field widths (big-endian), `/Index` subsections, FlateDecode
      * with optional PNG/TIFF `/Predictor` — the modern default shape.
      * `/Length` must be direct here (the map is not built yet).
      */
    private def readXrefStream(b: Array[Byte], off: Int): (Map[String, V], Seq[(Int, Entry)]) = {
      val lx = new Lexer(b, off)
      lx.number(); lx.number(); lx.expect("obj")
      val dict = lx.value() match { case VDict(m) => m; case _ => bad() }
      if (!dict.get("Type").contains(VName("XRef"))) bad()
      lx.ws()
      lx.expect("stream")
      if (lx.pos < b.length && b(lx.pos) == '\r') lx.pos += 1
      if (lx.pos < b.length && b(lx.pos) == '\n') lx.pos += 1
      val len = dict.get("Length") match {
        case Some(VNum(l)) => l.toLong
        case _ => bad()
      }
      if (len < 0 || len > MaxStreamBytes || lx.pos + len > b.length) bad()
      val raw = java.util.Arrays.copyOfRange(b, lx.pos, lx.pos + len.toInt)
      val w = dict.get("W") match {
        case Some(VArr(Vector(VNum(a), VNum(bb), VNum(c)))) => Array(a.toInt, bb.toInt, c.toInt)
        case _ => bad()
      }
      if (w.exists(x => x < 0 || x > 8)) bad()
      val rowW = w.sum
      if (rowW <= 0) bad()
      val filtered = dict.get("Filter") match {
        case None => raw
        case Some(VName("FlateDecode")) => inflate(raw)
        case _ => bad()
      }
      val data = dict.get("DecodeParms").orElse(dict.get("DP")) match {
        case Some(d) =>
          val pm = d match { case VDict(m) => m; case _ => bad() }
          pm.get("Predictor") match {
            case None | Some(VNum(1)) => filtered
            case Some(VNum(p)) =>
              val cols = pm.get("Columns") match {
                case Some(VNum(c)) => c.toInt
                case None => 1
                case _ => bad()
              }
              unpredict(filtered, p.toInt, cols)
            case _ => bad()
          }
        case None => filtered
      }
      val size = dict.get("Size") match { case Some(VNum(s)) => s.toInt; case _ => bad() }
      val index: Seq[(Int, Int)] = dict.get("Index") match {
        case Some(VArr(items)) =>
          if (items.length % 2 != 0) bad()
          items.grouped(2).map {
            case Vector(VNum(s), VNum(c)) => (s.toInt, c.toInt)
            case _ => bad()
          }.toSeq
        case None => Seq((0, size))
        case _ => bad()
      }
      val out = Seq.newBuilder[(Int, Entry)]
      var pos = 0
      def field(width: Int, default: Long): Long = {
        if (width == 0) return default
        var v = 0L
        var i = 0
        while (i < width) { v = (v << 8) | (data(pos + i) & 0xffL); i += 1 }
        pos += width
        v
      }
      index.foreach { case (start, count) =>
        if (count < 0 || count > MaxObjects) bad()
        var i = 0
        while (i < count) {
          if (pos + rowW > data.length) bad()
          val t = field(w(0), 1L) // width-0 type defaults to 1 per spec
          val f2 = field(w(1), 0L)
          val f3 = field(w(2), 0L)
          t match {
            case 1 => out += ((start + i) -> Direct(f2.toInt))
            case 2 => out += ((start + i) -> InStm(f2.toInt, f3.toInt))
            case _ => () // 0 = free; other types: ignored per spec
          }
          i += 1
        }
      }
      (dict, out.result())
    }

    /** Undo the `/Predictor` pre-filter on decoded xref rows: 2 = TIFF
      * horizontal difference, 10-15 = PNG per-row filters over
      * `columns`-byte rows (the common `/Predictor 12` = PNG Up).
      */
    private def unpredict(data: Array[Byte], predictor: Int, columns: Int): Array[Byte] = {
      if (columns <= 0) bad()
      if (predictor == 2) {
        if (data.length % columns != 0) bad()
        val out = data.clone()
        var r = 0
        while (r < out.length) {
          var i = 1
          while (i < columns) { out(r + i) = (out(r + i) + out(r + i - 1)).toByte; i += 1 }
          r += columns
        }
        out
      } else if (predictor >= 10 && predictor <= 15) {
        val rowW = columns + 1 // per-row filter byte
        if (data.length % rowW != 0) bad()
        val rows = data.length / rowW
        val out = new Array[Byte](rows * columns)
        var r = 0
        while (r < rows) {
          val f = data(r * rowW) & 0xff
          var i = 0
          while (i < columns) {
            val x = data(r * rowW + 1 + i) & 0xff
            val left = if (i > 0) out(r * columns + i - 1) & 0xff else 0
            val up = if (r > 0) out((r - 1) * columns + i) & 0xff else 0
            val ul = if (i > 0 && r > 0) out((r - 1) * columns + i - 1) & 0xff else 0
            val v = f match {
              case 0 => x
              case 1 => x + left
              case 2 => x + up
              case 3 => x + ((left + up) >> 1)
              case 4 =>
                val p = left + up - ul
                val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
                x + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
              case _ => bad()
            }
            out(r * columns + i) = v.toByte
            i += 1
          }
          r += 1
        }
        out
      } else bad()
    }

    private val cache = scala.collection.mutable.Map.empty[Int, (V, Array[Byte])]
    // parsed object streams: stm number -> (inflated data, obj -> data offset)
    private val objStms = scala.collection.mutable.Map.empty[Int, (Array[Byte], Map[Int, Int])]

    /** Resolve object `num`: (value, raw stream bytes or null). */
    def obj(num: Int): (V, Array[Byte]) = cache.getOrElseUpdate(num, {
      offsets.getOrElse(num, bad()) match {
        case Direct(off) => parseAt(num, off)
        case InStm(stm, _) =>
          // OBJECT STREAM (PDF 1.5): compressed non-stream objects packed
          // back to back behind an `N (objnum offset)` pair header
          val (data, index) = objStms.getOrElseUpdate(stm, {
            val (v, raw) = offsets.get(stm) match {
              case Some(Direct(off)) => parseAt(stm, off)
              case _ => bad() // object streams cannot nest
            }
            if (raw == null) bad()
            val d = v match { case VDict(m) => m; case _ => bad() }
            if (!d.get("Type").contains(VName("ObjStm"))) bad()
            val n = d.get("N") match { case Some(VNum(x)) => x.toInt; case _ => bad() }
            val first = d.get("First") match { case Some(VNum(x)) => x.toInt; case _ => bad() }
            if (n < 0 || n > MaxObjects) bad()
            val inflated = d.get("Filter") match {
              case None => raw
              case Some(VName("FlateDecode")) => inflate(raw)
              case _ => bad()
            }
            val hlx = new Lexer(inflated, 0)
            val idx = (0 until n).map { _ =>
              val on = hlx.number().toInt
              val oo = hlx.number().toInt
              on -> (first + oo)
            }.toMap
            (inflated, idx)
          })
          val at = index.getOrElse(num, bad())
          if (at < 0 || at >= data.length) bad()
          (new Lexer(data, at).value(), null) // in-stream objects carry no stream
      }
    })

    private def parseAt(num: Int, off: Int): (V, Array[Byte]) = {
      if (off < 0 || off >= b.length) bad()
      val lx = new Lexer(b, off)
      val n = lx.number().toInt
      if (n != num) bad()
      lx.number() // generation
      lx.expect("obj")
      val v = lx.value()
      lx.ws()
      if (lx.tryKeyword("stream")) {
        // EOL after `stream`: CRLF or LF
        if (lx.pos < b.length && b(lx.pos) == '\r') lx.pos += 1
        if (lx.pos < b.length && b(lx.pos) == '\n') lx.pos += 1
        val len = v match {
          case VDict(m) => m.get("Length") match {
            case Some(VNum(l)) => l.toLong
            case Some(r: VRef) => deref(r) match { case VNum(l) => l.toLong; case _ => bad() }
            case _ => bad()
          }
          case _ => bad()
        }
        if (len < 0 || len > MaxStreamBytes || lx.pos + len > b.length) bad()
        val raw = java.util.Arrays.copyOfRange(b, lx.pos, lx.pos + len.toInt)
        (v, raw)
      } else (v, null)
    }

    def deref(v: V): V = v match {
      case r: VRef => obj(r.num)._1
      case other => other
    }
  }

  /** Extracted text, or null if the payload is not a cleanly-walkable
    * classic-xref PDF with extractable text. Never throws.
    */
  def extract(b: Array[Byte]): String =
    try extractImpl(b)
    catch { case Bad => null; case scala.util.control.NonFatal(_) => null }

  private def extractImpl(b: Array[Byte]): String = {
    if (b == null || b.length < 32) return null
    if (!(b(0) == '%' && b(1) == 'P' && b(2) == 'D' && b(3) == 'F' && b(4) == '-')) return null
    val doc = new Doc(b)
    val root = doc.trailerRoot.getOrElse(bad())
    val catalog = doc.deref(root) match { case VDict(m) => m; case _ => bad() }
    val pagesRef = catalog.getOrElse("Pages", bad())
    // walk the page tree
    val pages = Vector.newBuilder[Map[String, V]]
    var seen = 0
    def walk(v: V, depth: Int): Unit = {
      if (depth > 32) bad()
      doc.deref(v) match {
        case VDict(m) =>
          m.get("Type") match {
            case Some(VName("Pages")) =>
              doc.deref(m.getOrElse("Kids", bad())) match {
                case VArr(kids) => kids.foreach(walk(_, depth + 1))
                case _ => bad()
              }
            case Some(VName("Page")) =>
              seen += 1
              if (seen > MaxPages) bad()
              pages += m
            case _ => bad()
          }
        case _ => bad()
      }
    }
    walk(pagesRef, 0)
    val sb = new StringBuilder
    def emitNl(): Unit =
      if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
    pages.result().foreach { page =>
      emitNl()
      val fonts = pageFonts(doc, page)
      val contents = page.get("Contents") match {
        case None => Vector.empty[V]
        case Some(v) => doc.deref(v) match {
          case VArr(items) => items
          case _ => Vector(v)
        }
      }
      contents.foreach { c =>
        val r = c match { case r: VRef => r; case _ => bad() }
        val (v, raw) = doc.obj(r.num)
        if (raw == null) bad()
        val dict = v match { case VDict(m) => m; case _ => bad() }
        val data = dict.get("Filter") match {
          case None => raw
          case Some(VName("FlateDecode")) => inflate(raw)
          case _ => bad() // other filters: documented-unsupported
        }
        interpret(data, sb, emitNl _, fonts)
      }
    }
    val out = sb.toString
    val trimmed = out.dropWhile(_ == '\n')
    if (trimmed.isEmpty) null else trimmed
  }

  private def inflate(z: Array[Byte]): Array[Byte] = {
    if (z.length < 2) bad()
    val cmf = z(0) & 0xff; val flg = z(1) & 0xff
    if ((cmf & 0x0f) != 8 || ((cmf << 8) | flg) % 31 != 0) bad()
    if ((flg & 0x20) != 0) bad()
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(z, 2, z.length - 2)
      val out = new java.io.ByteArrayOutputStream(math.min(z.length * 4, 1 << 16))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = try inf.inflate(buf)
        catch { case _: java.util.zip.DataFormatException => bad() }
        if (n == 0) {
          if (inf.needsInput() || inf.needsDictionary()) bad() // truncated
        } else out.write(buf, 0, n)
        if (out.size > MaxStreamBytes) bad()
      }
      out.toByteArray
    } finally inf.end()
  }

  /** The page's font resources, name -> Some(cid->text map) for a
    * Type0/Identity CID font with a usable `/ToUnicode` CMap, None for a
    * simple (single-byte, Latin-1-shown) font. A Type0 font WITHOUT a
    * parseable ToUnicode has no recoverable text mapping — conservative
    * decline ([[bad]]), the whole-document NULL rule.
    */
  private def pageFonts(doc: Doc, page: Map[String, V]): Map[String, Option[Map[Int, String]]] = {
    val res = page.get("Resources").map(doc.deref) match {
      case Some(VDict(m)) => m
      case _ => return Map.empty
    }
    val fontDict = res.get("Font").map(doc.deref) match {
      case Some(VDict(m)) => m
      case _ => return Map.empty
    }
    fontDict.map { case (name, fv) =>
      val fm = doc.deref(fv) match { case VDict(m) => m; case _ => bad() }
      val isType0 = fm.get("Subtype").contains(VName("Type0"))
      if (!isType0) name -> None
      else {
        // composite font: only the identity CID encodings are in scope
        // (the overwhelmingly dominant embedded-subset shape); a custom
        // CMap encoding would need the full CMap machinery
        doc.deref(fm.getOrElse("Encoding", bad())) match {
          case VName("Identity-H") | VName("Identity-V") => ()
          case _ => bad()
        }
        val r = fm.getOrElse("ToUnicode", bad()) match {
          case r: VRef => r
          case _ => bad()
        }
        val (v, raw) = doc.obj(r.num)
        if (raw == null) bad()
        val dict = v match { case VDict(m) => m; case _ => bad() }
        val data = dict.get("Filter") match {
          case None => raw
          case Some(VName("FlateDecode")) => inflate(raw)
          case _ => bad()
        }
        name -> Some(parseToUnicode(data))
      }
    }
  }

  /** Parse a `/ToUnicode` CMap stream's `bfchar`/`bfrange` sections into
    * code -> text (PDF 32000 §9.10.3; dst strings are UTF-16BE, a
    * bfrange's hex dst increments its LAST code unit across the range).
    * Sections outside bfchar/bfrange (codespacerange, the CIDInit
    * boilerplate) are skipped at token level. Anything malformed: [[bad]].
    */
  private[expressions] def parseToUnicode(data: Array[Byte]): Map[Int, String] = {
    val out = Map.newBuilder[Int, String]
    var p = 0
    var entries = 0
    def ws(): Unit = {
      var go = true
      while (go && p < data.length) {
        val c = data(p) & 0xff
        if (c == ' ' || c == '\r' || c == '\n' || c == '\t' || c == '\f' || c == 0) p += 1
        else if (c == '%') { while (p < data.length && data(p) != '\n') p += 1 }
        else go = false
      }
    }
    def hexDigit(c: Int): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else bad()
    // a <...> hex string as raw bytes (odd digit count pads 0, as PDF)
    def hexStr(): Array[Byte] = {
      p += 1 // '<'
      val digits = new StringBuilder
      while (p < data.length && data(p) != '>') {
        val c = data(p) & 0xff
        if (!(c == ' ' || c == '\r' || c == '\n' || c == '\t')) digits.append(c.toChar)
        p += 1
      }
      if (p >= data.length) bad()
      p += 1 // '>'
      // codes are <= 4 bytes; dst runs can be ligature expansions ("ffi")
      // — cap generously, decline absurdity
      if (digits.length > 32) bad()
      val s = if ((digits.length & 1) == 1) digits.toString + "0" else digits.toString
      val b = new Array[Byte](s.length / 2)
      var i = 0
      while (i < b.length) {
        b(i) = ((hexDigit(s.charAt(2 * i)) << 4) | hexDigit(s.charAt(2 * i + 1))).toByte
        i += 1
      }
      b
    }
    def codeOf(b: Array[Byte]): Int = {
      if (b.isEmpty || b.length > 4) bad()
      var v = 0
      b.foreach(x => v = (v << 8) | (x & 0xff))
      v
    }
    def textOf(b: Array[Byte]): String = new String(b, "UTF-16BE")
    def keyword(): String = {
      val start = p
      while (p < data.length) {
        val c = data(p) & 0xff
        if (c == ' ' || c == '\r' || c == '\n' || c == '\t' || c == '\f' || c == 0 ||
          c == '<' || c == '>' || c == '[' || c == ']' || c == '/' || c == '(' || c == '%')
          return new String(data, start, p - start, "ISO-8859-1")
        p += 1
      }
      new String(data, start, p - start, "ISO-8859-1")
    }
    def addEntry(): Unit = { entries += 1; if (entries > (1 << 16)) bad() }
    var mode = 0 // 0 outside, 1 bfchar, 2 bfrange
    while ({ ws(); p < data.length }) {
      val c = data(p) & 0xff
      if (c == '<' && p + 1 < data.length && data(p + 1) == '<') {
        // a dict (CIDSystemInfo boilerplate): skip balanced << >>
        var depth = 0
        var go = true
        while (go && p < data.length) {
          if (p + 1 < data.length && data(p) == '<' && data(p + 1) == '<') { depth += 1; p += 2 }
          else if (p + 1 < data.length && data(p) == '>' && data(p + 1) == '>') {
            depth -= 1; p += 2; if (depth == 0) go = false
          } else p += 1
        }
        if (depth != 0) bad()
      } else if (c == '>') p += 1 // stray: tolerate
      else if (c == '<') {
        val first = hexStr()
        if (mode == 1) {
          ws(); if (p >= data.length || data(p) != '<') bad()
          out += codeOf(first) -> textOf(hexStr())
          addEntry()
        } else if (mode == 2) {
          ws(); if (p >= data.length || data(p) != '<') bad()
          val hi = codeOf(hexStr())
          val lo = codeOf(first)
          if (hi < lo || hi - lo > 0xffff) bad()
          ws()
          if (p < data.length && data(p) == '[') {
            p += 1
            var code = lo
            while ({ ws(); p < data.length && data(p) != ']' }) {
              if (data(p) != '<' || code > hi) bad()
              out += code -> textOf(hexStr())
              addEntry()
              code += 1
            }
            if (p >= data.length) bad()
            p += 1 // ']'
          } else if (p < data.length && data(p) == '<') {
            val dst = textOf(hexStr())
            if (dst.isEmpty) bad()
            var code = lo
            while (code <= hi) {
              val off = code - lo
              val lastUnit = (dst.charAt(dst.length - 1) + off).toChar
              out += code -> (dst.substring(0, dst.length - 1) + lastUnit)
              addEntry()
              code += 1
            }
          } else bad()
        }
        // outside a bf section (codespacerange etc.): ignored
      } else if (c == '[' || c == ']') p += 1
      else if (c == '/') { p += 1; keyword(); () }
      else if (c == '(') { // literal string (CMapName defs): skip balanced
        var depth = 1; p += 1
        while (depth > 0 && p < data.length) {
          val x = data(p) & 0xff
          if (x == '\\') p += 1
          else if (x == '(') depth += 1
          else if (x == ')') depth -= 1
          p += 1
        }
        if (depth != 0) bad()
      } else {
        keyword() match {
          case "beginbfchar" => mode = 1
          case "endbfchar" => mode = 0
          case "beginbfrange" => mode = 2
          case "endbfrange" => mode = 0
          case "" => bad()
          case _ => () // numbers, def, begincmap, usedict boilerplate
        }
      }
    }
    out.result()
  }

  /** The content-stream text interpreter: a tiny operand-stack machine
    * over the same lexer, handling only what text extraction needs.
    * `fonts` carries the page's resolved font map — `Tf` switches the
    * SHOW decoding between single-byte Latin-1 (simple fonts) and 2-byte
    * CID codes through the font's ToUnicode map (Type0/Identity — the
    * embedded-subset shape; unmapped codes contribute nothing, the same
    * conservative rule real extractors apply).
    */
  private def interpret(data: Array[Byte], sb: StringBuilder, emitNl: () => Unit,
      fonts: Map[String, Option[Map[Int, String]]] = Map.empty): Unit = {
    val lx = new Lexer(data, 0)
    var lastStr: Array[Byte] = null
    var arr: Vector[V] = null
    var lastName: String = null
    var cidMap: Map[Int, String] = null // null = simple font
    var steps = 0
    def show(bytes: Array[Byte]): Unit =
      if (cidMap == null) bytes.foreach(x => sb.append((x & 0xff).toChar)) // Latin-1
      else {
        if ((bytes.length & 1) != 0) bad() // Identity-H codes are 2 bytes
        var i = 0
        while (i < bytes.length) {
          val code = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
          cidMap.get(code).foreach(sb.append(_))
          i += 2
        }
      }
    while ({ lx.ws(); lx.pos < data.length }) {
      steps += 1
      if (steps > (1 << 22)) bad()
      val c = lx.peek
      if (c == '(') { lx.pos += 1; lastStr = lx.literalString().asInstanceOf[VStr].v }
      else if (c == '<' && lx.pos + 1 < data.length && data(lx.pos + 1) == '<') {
        lx.value() // inline dict (marked content props): parse + drop
      } else if (c == '<') { lx.pos += 1; lastStr = lx.hexString().asInstanceOf[VStr].v }
      else if (c == '[') { arr = lx.value() match { case VArr(v) => v; case _ => bad() } }
      else if (c == '/') { lx.pos += 1; lastName = lx.name() }
      else if (c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) { lx.number(); () }
      else {
        // operator: a run of non-delimiter, non-numeric chars
        val start = lx.pos
        var go = true
        while (go && lx.pos < data.length) {
          val x = data(lx.pos) & 0xff
          if (x == ' ' || x == '\r' || x == '\n' || x == '\t' || x == '\f' || x == 0 ||
            x == '(' || x == '<' || x == '[' || x == '/' || x == ']' || x == ')' || x == '>' ||
            x == '%') go = false
          else lx.pos += 1
        }
        if (lx.pos == start) bad() // stray delimiter
        val op = new String(data, start, lx.pos - start, "ISO-8859-1")
        op match {
          case "Tf" => // current font: switches the show decoding
            cidMap =
              if (lastName == null) null
              else fonts.get(lastName).flatten.orNull
          case "Tj" => if (lastStr != null) show(lastStr)
          case "'" | "\"" => emitNl(); if (lastStr != null) show(lastStr)
          case "TJ" =>
            if (arr != null) arr.foreach {
              case VStr(s) => show(s)
              case _ => () // kerning numbers
            }
          case "Td" | "TD" | "T*" => emitNl()
          case "BI" =>
            // inline image: scan to `EI` at a whitespace boundary
            var found = false
            while (!found) {
              if (lx.pos + 2 > data.length) bad()
              if (data(lx.pos) == 'E' && data(lx.pos + 1) == 'I') { lx.pos += 2; found = true }
              else lx.pos += 1
            }
          case _ => () // every other operator: operands already consumed
        }
        if (op == "Tj" || op == "'" || op == "\"") lastStr = null
        if (op == "TJ") arr = null
      }
    }
  }
}
