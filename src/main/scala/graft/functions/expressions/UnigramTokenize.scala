package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Unigram-LM tokenizer APPLY (the SentencePiece family, Kudo 2018):
  * per word, the MINIMUM-COST segmentation under a trained unigram model
  * — Viterbi dynamic programming over integer millibit costs
  * (`cost_m(t) = floor(-log2 p(t) * 1000)`, quantized at training time so
  * every DP sum and comparison is exact integer arithmetic on any
  * engine), where [[BpeTokenize]] is greedy longest-match. Ties on total
  * cost resolve to the LONGER token at the current position — a total
  * order the DuckDB window-carry recursive-CTE oracle mirrors exactly.
  *
  * Unknown single characters (absent from the model — possible only for
  * characters the training corpus never saw) cost
  * [[UnigramTokenize.UnkCostMillibits]] and emit id -1, the same unknown
  * sentinel as [[BpeTokenize]].
  *
  * Shape at 100 TB: identical to [[BpeTokenize]] — the model (~1k
  * entries) rides inside the expression, the DP is O(chars × maxLen) per
  * row with two small per-word arrays, and tokenization is a pure
  * projection over the text scan: no shuffle, no join, no UDF. Output:
  * struct(n_tokens, id_checksum, ids); null words contribute nothing, a
  * null array is null. `CodegenFallback` deliberately — hash probes and
  * array DP, plain JVM work ([[MinHashWordsSig]]'s reasoning).
  */
case class UnigramTokenize(
    child: Expression,
    vocab: Seq[(String, Int, Long)],
    maxLen: Int)
    extends UnaryExpression with CodegenFallback {

  require(maxLen >= 1, "maxLen must be >= 1")
  require(vocab.forall(_._2 >= 0), "vocab ids must be non-negative (-1 is the unknown sentinel)")
  require(vocab.forall(_._3 >= 0), "costs are non-negative millibits")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("id_checksum", LongType, nullable = false),
    StructField("ids", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_unigram_tokenize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires an array<string> of words, got ${dt.catalogString}")
  }

  /** (id, cost_m) per token; rebuilt per deserialized task. */
  @transient private lazy val table: java.util.HashMap[String, (Int, Long)] = {
    val m = new java.util.HashMap[String, (Int, Long)](vocab.size * 2)
    vocab.foreach { case (tok, id, cost) => m.put(tok, (id, cost)) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    var checksum = 0L
    var count = 0L
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val cps = words.getUTF8String(i).toString.codePoints().toArray
        val len = cps.length
        if (len > 0) {
          val dp = new Array[Long](len + 1)
          val bestL = new Array[Int](len)
          val bestId = new Array[Int](len)
          var pos = len - 1
          while (pos >= 0) {
            var best = Long.MaxValue
            var bl = 1
            var bid = -1
            var l = 1
            val lMax = math.min(maxLen, len - pos)
            while (l <= lMax) {
              val hit = table.get(new String(cps, pos, l))
              if (hit != null) {
                val cand = hit._2 + dp(pos + l)
                // tie on total cost -> the longer token wins
                if (cand < best || (cand == best && l > bl)) {
                  best = cand; bl = l; bid = hit._1
                }
              } else if (l == 1) {
                val cand = UnigramTokenize.UnkCostMillibits + dp(pos + 1)
                if (cand < best) { best = cand; bl = 1; bid = -1 }
              }
              l += 1
            }
            dp(pos) = best
            bestL(pos) = bl
            bestId(pos) = bid
            pos -= 1
          }
          var p = 0
          while (p < len) {
            out += bestId(p)
            checksum += bestId(p)
            count += 1
            p += bestL(p)
          }
        }
      }
      i += 1
    }
    InternalRow(count, checksum, new GenericArrayData(out.result()))
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramTokenize =
    copy(child = newChild)
}

object UnigramTokenize {
  /** Cost of an out-of-model single character: 1000 bits — far above any
    * in-model token (a 1-in-2^60 unigram costs 60k millibits), so known
    * segmentations always win, yet finite so segmentation is total.
    */
  val UnkCostMillibits = 1000000L
}
