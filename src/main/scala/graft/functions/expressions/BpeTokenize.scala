package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Subword tokenizer APPLY: greedy longest-match of each word against a
  * trained vocabulary (single characters + the top-K multi-character
  * merges, see [[graft.functions.Bpe.trainVocab]]), emitting per-row token
  * ids plus exact counts — the step that turns the pipeline's
  * whitespace-word token proxies into REAL tokenizer tokens, so packing /
  * budget / histogram decisions happen in the same units the trainer will
  * consume.
  *
  * Shape at 100 TB: the vocabulary (~1k entries) rides inside the
  * expression — serialized once per task binary, hash-probed O(chars x
  * maxLen) per row — so tokenizing the corpus is a pure per-row projection
  * over the text scan: NO shuffle, NO join, NO UDF-serialization of rows.
  * (The word-level alternative — dedup words, tokenize the vocabulary,
  * join back — trades that scan for two shuffles; with a hash probe this
  * cheap, the projection wins at every scale.)
  *
  * Matching contract (mirrored exactly by the DuckDB recursive-CTE
  * oracle): per word, at each position take the LONGEST vocab entry (up to
  * `maxLen` codepoints) equal to the substring starting there, preferring
  * longer matches; every single character seen at training time is in the
  * vocab, so unknowns (id -1) appear only for characters the training
  * corpus never saw. Substring arithmetic is over CODEPOINTS (Java chars
  * would split astral-plane symbols and disagree with SQL `substr`
  * semantics).
  *
  * Output: struct(n_tokens, id_checksum, ids) — the scalar stats ride
  * along so per-doc aggregates need no second pass over the ids array
  * (and no higher-order-function fold, with its CollapseProject
  * re-evaluation hazard — see [[MinHashWordsSig]]'s scaladoc). Null words
  * inside the array contribute nothing; a null array is null.
  *
  * `CodegenFallback` deliberately: the work is hash probing and substring
  * building — plain JVM calls, same reasoning as [[MinHashWordsSig]].
  */
case class BpeTokenize(
    child: Expression,
    vocab: Seq[(String, Int)],
    maxLen: Int)
    extends UnaryExpression with CodegenFallback {

  require(maxLen >= 1, "maxLen must be >= 1")
  require(vocab.forall(_._2 >= 0), "vocab ids must be non-negative (-1 is the unknown sentinel)")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("id_checksum", LongType, nullable = false),
    StructField("ids", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bpe_tokenize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires an array<string> of words, got ${dt.catalogString}")
  }

  // @transient: rebuilt per deserialized task from the Seq (which is the
  // case-class field, so expression equality/serialization stay canonical)
  @transient private lazy val table: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.size * 2)
    vocab.foreach { case (tok, id) => m.put(tok, id) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val ids = new scala.collection.mutable.ArrayBuilder.ofInt
    var checksum = 0L
    var count = 0L
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val cps = words.getUTF8String(i).toString.codePoints().toArray
        var pos = 0
        while (pos < cps.length) {
          var l = math.min(maxLen, cps.length - pos)
          var id = -1
          var step = 1
          while (l >= 1 && id == -1) {
            val hit = table.get(new String(cps, pos, l))
            if (hit != null) { id = hit; step = l } else l -= 1
          }
          ids += id
          checksum += id
          count += 1
          pos += step
        }
      }
      i += 1
    }
    InternalRow(count, checksum, new GenericArrayData(ids.result()))
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenize =
    copy(child = newChild)
}
