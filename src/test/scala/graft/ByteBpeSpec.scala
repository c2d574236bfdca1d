package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

/** Byte-level BPE (GPT-2 family): training order determinism, the
  * leftmost non-overlapping merge semantics, total byte fallback on
  * arbitrary UTF-8, and the id numbering contract (0..255 bytes,
  * 256+rank merges).
  */
class ByteBpeSpec extends SparkSpec {
  import spark.implicits._

  private def ids(text: String, merges: Seq[(String, String)]): Seq[Int] = {
    val df = Seq(text).toDF("t")
      .select(Bpe.byteTokenize(col("t"), merges).as("st"))
      .select(col("st.ids"))
    df.collect()(0).getSeq[Int](0)
  }

  test("training: most frequent pair merges first; ranks are deterministic") {
    val docs = Seq.fill(8)("aaab").toDF("text")
    val merges = Bpe.trainByteMerges(docs, "text", 2)
    // "aaab" bytes 61 61 61 62: pairs (61,61) x2 per word beat (61,62) x1
    assert(merges.head == ("61", "61"), s"got $merges")
  }

  test("apply: leftmost non-overlapping — 'aaa' becomes [aa][a], never [a][aa]") {
    val merges = Seq(("61", "61"))
    assert(ids("aaa", merges) == Seq(256, 0x61))
    assert(ids("aaaa", merges) == Seq(256, 256))
    assert(ids("aaaaa", merges) == Seq(256, 256, 0x61))
  }

  test("merge chains apply in rank order; later merges see earlier outputs") {
    // rank0: a+a -> aa; rank1: aa+b -> aab
    val merges = Seq(("61", "61"), ("6161", "62"))
    assert(ids("aab", merges) == Seq(257))
    assert(ids("ab", merges) == Seq(0x61, 0x62), "rank1 needs rank0's output")
  }

  test("total byte fallback: multi-byte UTF-8 and controls tokenize without unknowns") {
    val merges = Seq(("61", "61"))
    val s = "héllo é世 a\ta"
    val got = ids(s, merges)
    assert(got.nonEmpty && got.forall(id => id >= 0 && id < 258))
    // round-trip byte count: sum of per-token byte lengths == utf8 length
    val byteLen = s.getBytes("UTF-8").length
    val tokBytes = got.map(id => if (id < 256) 1 else 2).sum
    assert(tokBytes == byteLen)
  }

  test("pretokenizer: contractions split off; leading spaces attach to words") {
    val got = ids("it's fine", Seq.empty)
    // "it" + "'s" + " fine" as pretokens; with no merges ids are raw bytes
    val want = ("it" + "'s" + " fine").getBytes("UTF-8").map(_.toInt & 0xff).toSeq
    assert(got == want)
  }

  test("empty and null inputs are total") {
    assert(ids("", Seq(("61", "61"))).isEmpty)
    val row = Seq[Option[String]](None).toDF("t")
      .select(Bpe.byteTokenize(col("t"), Seq(("61", "61"))).as("st"))
      .collect()(0)
    assert(row.isNullAt(0))
  }
}
