package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.NativeColumns

/** Subword-tokenizer vocabulary TRAINING plus the apply-side wrappers.
  *
  * The vocabulary is derived from the corpus itself (fixture-trained, the
  * way a sentencepiece/BPE model is trained offline before a data build):
  *
  *  - base vocab: every distinct character observed in the corpus's
  *    whitespace words, id 0.. in lexicographic (codepoint) order;
  *  - merges: the `merges` most frequent word-internal character
  *    substrings of length 2..`maxLen`, counted over word OCCURRENCES
  *    (so "the"'s trigram outweighs a rare word's), ranked by
  *    (count DESC, token ASC) — a total order, so both engines pick the
  *    identical top-K — ids continuing after the base vocab.
  *
  * This is the frequency-merge family of BPE (Sennrich et al. 2016)
  * collapsed to one counting pass: instead of 1k sequential merge rounds
  * (each a full corpus re-scan — 1k passes at 100 TB), the top-K frequent
  * substrings ARE the merge table, and greedy longest-match apply
  * ([[graft.functions.expressions.BpeTokenize]]) plays the role of the
  * merge order. Training cost: ONE exchange over (substring, count) pairs
  * (map-side combined) + a <= (chars + merges)-row collect — the standard
  * "train tiny model on an aggregation, broadcast it back" shape, like
  * the hashed-classifier weights and the IVF centroids.
  *
  * Both stages are recomputed verbatim by the DuckDB oracle (substring
  * explosion, counting, ranking, and the greedy apply as a recursive
  * CTE), so tokenization is differentially verified end to end.
  */
object Bpe {

  /** Train the vocab over `docs(textCol)`: returns (token, id), singles
    * first (lexicographic), then merges by (count DESC, token ASC).
    * Driver-side result by design — it IS the model.
    */
  def trainVocab(
      docs: DataFrame,
      textCol: String,
      maxLen: Int = 4,
      merges: Int = 1000): Seq[(String, Int)] = {
    require(maxLen >= 2, "maxLen must be >= 2 (singles are always included)")
    require(merges >= 0, "merges must be >= 0")
    // distinct words with occurrence counts: the substring explosion runs
    // over the VOCABULARY (Zipf-small), weighted by word frequency —
    // identical counts to exploding every occurrence, at a fraction of
    // the rows
    val wcnt = docs.select(explode(Text.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
    val subsByLen = (2 to maxLen).map { l =>
      wcnt.filter(length(col("w")) >= l)
        .select(col("wc"), explode(transform(
          sequence(lit(1), length(col("w")) - (l - 1)),
          i => col("w").substr(i, lit(l)))).as("tok"))
    }
    val multi = subsByLen.reduce(_ unionByName _)
      .groupBy("tok").agg(sum("wc").as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(merges)
    val singles = wcnt
      .select(explode(transform(
        sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1)))).as("tok"))
      .distinct()
      .orderBy(col("tok").asc)
    val s = singles.collect().map(_.getString(0))
    val m = multi.collect().map(_.getString(0))
    (s.zipWithIndex ++ m.zipWithIndex.map { case (t, i) => (t, s.length + i) }).toSeq
  }

  /** The trained vocab as a tiny DataFrame (token, id) — broadcast-join it
    * to decode ids back to token strings (histograms, reports).
    */
  def vocabDF(docs: DataFrame, vocab: Seq[(String, Int)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    vocab.toDF("token", "id")
  }

  /** struct(n_tokens, id_checksum, ids) of `textCol` under `vocab` — one
    * codegen-fallback projection, no shuffle.
    */
  def tokenize(textCol: Column, vocab: Seq[(String, Int)], maxLen: Int = 4): Column =
    NativeColumns.bpeTokenize(Text.words(textCol), vocab, maxLen)

  /** BYTE-LEVEL BPE merge training (GPT-2 family, Sennrich-style
    * sequential merges): pretokenize with
    * [[graft.functions.expressions.ByteBpeTokenize.Pretokenizer]], build
    * the weighted pretoken dictionary with ONE map-side-combined
    * aggregation (Zipf-small: the only corpus-sized step), then run the
    * merge rounds driver-side over the dictionary — each round merges
    * the (count DESC, left-hex ASC, right-hex ASC) argmax adjacent pair,
    * exactly the total order the DuckDB oracle's unrolled stages use.
    * Returns the ordered merge list as uppercase-hex byte-sequence
    * pairs; ids are 0..255 bytes then 256+rank.
    */
  def trainByteMerges(
      docs: DataFrame,
      textCol: String,
      numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val dict: Array[(Array[String], Long)] = docs
      .select(explode(regexp_extract_all(col(textCol),
        lit(expressions.ByteBpeTokenize.Pretokenizer), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .collect()
      .map(r => (r.getString(0).getBytes("UTF-8").map(b => f"${b & 0xff}%02X"): Array[String], r.getLong(1)))
    var words = dict
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (toks, wc) =>
        var i = 0
        while (i + 1 < toks.length) {
          val k = (toks(i), toks(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + wc
          i += 1
        }
      }
      if (counts.isEmpty) round = numMerges
      else {
        val (best, _) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += best
        words = words.map { case (toks, wc) =>
          if (toks.length < 2) (toks, wc)
          else {
            val nt = new scala.collection.mutable.ArrayBuffer[String](toks.length)
            var i = 0
            while (i < toks.length) {
              if (i + 1 < toks.length && toks(i) == best._1 && toks(i + 1) == best._2) {
                nt += best._1 + best._2; i += 2
              } else { nt += toks(i); i += 1 }
            }
            (nt.toArray, wc)
          }
        }
        round += 1
      }
    }
    out.toSeq
  }

  /** struct(n_tokens, id_checksum, ids) of `textCol` under the trained
    * byte-level merge table — one codegen-fallback projection.
    */
  def byteTokenize(textCol: Column, merges: Seq[(String, String)]): Column =
    NativeColumns.byteBpeTokenize(textCol, merges)
}
