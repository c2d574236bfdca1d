package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Decode HTML NUMERIC character references — `&#8217;` and `&#x2019;`
  * forms — the one entity family a regexp_replace chain cannot express
  * (the replacement needs a digits -> codepoint conversion), completing
  * [[graft.functions.Text.extractHtmlText]]'s documented limitation as an
  * opt-in second pass. Named entities stay the regex chain's job (decode
  * order matters there: `&amp;` strictly last).
  *
  * Totality contract (crawl text is adversarial): an invalid reference is
  * passed through VERBATIM, never an error and never a replacement
  * character — out-of-range codepoints (0 or > U+10FFFF), UTF-16
  * surrogate halves (U+D800..U+DFFF, meaningless as standalone
  * codepoints), digit runs longer than 8, and unterminated/empty digit
  * runs all stay literal text. All-reference-free rows take an indexOf
  * fast path that returns the INPUT buffer untouched (the
  * [[NfcNormalize]] discipline — the overwhelmingly common case costs one
  * scan, zero allocation).
  *
  * `CodegenFallback`: the per-row work is a scan plus integer parsing —
  * plain JVM code, same reasoning as [[MinHashWordsSig]].
  */
case class DecodeNumericRefs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_decode_numeric_refs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckSuccess
    case dt => TypeCheckFailure(s"$prettyName requires a string, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.indexOf("&#") < 0) return input
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var consumed = false
      if (c == '&' && i + 1 < n && s.charAt(i + 1) == '#') {
        var j = i + 2
        val hex = j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')
        if (hex) j += 1
        val digitsStart = j
        var cp = 0
        var overflow = false
        while (j < n && Character.digit(s.charAt(j), if (hex) 16 else 10) >= 0) {
          if (j - digitsStart >= 8) overflow = true
          else cp = cp * (if (hex) 16 else 10) + Character.digit(s.charAt(j), if (hex) 16 else 10)
          j += 1
        }
        val nDigits = j - digitsStart
        if (j < n && s.charAt(j) == ';' && nDigits >= 1 && !overflow &&
          cp >= 1 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF)) {
          sb.appendCodePoint(cp)
          i = j + 1
          consumed = true
        }
      }
      if (!consumed) { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): DecodeNumericRefs =
    copy(child = newChild)
}
