package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** BYTE-LEVEL BPE apply — the production-LLM tokenizer shape (GPT-2
  * family): regex pretokenization, UTF-8 BYTES as the base alphabet
  * (ids 0..255 — total byte fallback, NO unknowns ever), and the
  * trained merge table ([[graft.functions.Bpe.trainByteMerges]])
  * applied IN RANK ORDER with leftmost non-overlapping scans per
  * pretoken — the subword-nmt apply, equivalent to GPT-2's
  * lowest-rank-pair loop because a merge's inputs can only be produced
  * by earlier-ranked merges. Merged token ids continue at 256 + rank.
  *
  * The pretokenizer is the GPT-2 pattern MINUS the `\\s+(?!\\S)`
  * lookahead (the oracle's RE2 engine has no lookahead; both engines
  * run the identical lookahead-free pattern, so they agree by
  * construction):
  * `'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+`.
  *
  * Shape at 100 TB: the merge table rides inside the expression — a
  * pure per-row projection over the text scan, no shuffle, no join, no
  * UDF (same contract as [[BpeTokenize]]). Output: struct(n_tokens,
  * id_checksum, ids) where the checksum is POSITION-WEIGHTED
  * (sum of id * 1-based-position) so it pins the exact sequence, not
  * just the bag.
  *
  * `CodegenFallback` deliberately: regex + list merging are plain JVM
  * calls (see [[BpeTokenize]]'s scaladoc for the reasoning).
  */
case class ByteBpeTokenize(
    child: Expression,
    merges: Seq[(String, String)]) // ordered (hexLeft, hexRight) pairs
    extends UnaryExpression with CodegenFallback {

  require(merges.forall { case (a, b) =>
    a.nonEmpty && b.nonEmpty && (a + b).forall(c => "0123456789ABCDEF".contains(c)) },
    "merges must be uppercase-hex byte-sequence pairs")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("id_checksum", LongType, nullable = false),
    StructField("ids", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_byte_bpe_tokenize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires a string column, got ${dt.catalogString}")
  }

  @transient private lazy val pretokenizer =
    java.util.regex.Pattern.compile(ByteBpeTokenize.Pretokenizer)

  @transient private lazy val mergedIds: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    // two merge paths can build the same byte sequence: the EARLIEST
    // rank owns the id (the oracle mirrors with MIN(id))
    merges.zipWithIndex.foreach { case ((a, b), i) => m.putIfAbsent(a + b, 256 + i) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val ids = new scala.collection.mutable.ArrayBuilder.ofInt
    var checksum = 0L
    var count = 0L
    val m = pretokenizer.matcher(text)
    while (m.find()) {
      val bytes = m.group().getBytes("UTF-8")
      var toks: Array[String] = bytes.map(b => f"${b & 0xff}%02X")
      merges.foreach { case (a, b) =>
        // leftmost non-overlapping single pass (subword-nmt semantics)
        if (toks.length >= 2) {
          val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
              out += a + b; i += 2
            } else { out += toks(i); i += 1 }
          }
          toks = out.toArray
        }
      }
      toks.foreach { t =>
        val id =
          if (t.length == 2) Integer.parseInt(t, 16)
          else mergedIds.get(t).intValue()
        ids += id
        count += 1
        checksum += id.toLong * count // 1-based position weight
      }
    }
    InternalRow(count, checksum, new GenericArrayData(ids.result()))
  }

  override protected def withNewChildInternal(newChild: Expression): ByteBpeTokenize =
    copy(child = newChild)
}

object ByteBpeTokenize {
  /** GPT-2-family pretokenizer, lookahead-free (see class doc). */
  val Pretokenizer: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
}
