package graft

import graft.quality.Scoring
import org.apache.spark.sql.DataFrame

/** Reciprocal-rank fusion on hand-checkable lists (the registry row
  * hash-verifies the full BM25 + cosine composition against DuckDB).
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val Lcm = 142813628717760L // lcm(61..70), mirrored in the registry oracle

  private def list(rows: (Long, Long, Int)*): DataFrame =
    rows.toDF("qid", "doc_id", "rank")

  private def fuse(lists: Seq[DataFrame], k: Int = 10) =
    Scoring.rrfFuse(lists, k0 = 60L, maxRank = 10, k = k)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rrf_units"), r.getAs[Long]("n_lists"), r.getAs[Long]("rank")))
      .toMap

  test("two-list agreement outranks a single first place") {
    // doc 7 is rank 2 in BOTH lists; doc 1 / doc 2 are rank 1 in one each:
    // 2/(60+2) > 1/(60+1) + nothing, so consensus wins
    val a = list((1L, 1L, 1), (1L, 7L, 2))
    val b = list((1L, 2L, 1), (1L, 7L, 2))
    val r = fuse(Seq(a, b))
    assert(r(7L) == ((2 * (Lcm / 62), 2L, 1L)))
    assert(r(1L) == ((Lcm / 61, 1L, 2L)))  // doc-id tie-break under equal units
    assert(r(2L) == ((Lcm / 61, 1L, 3L)))
  }

  test("unit arithmetic is the exact LCM reciprocal") {
    val r = fuse(Seq(list((1L, 5L, 10))))
    assert(r(5L)._1 == Lcm / 70 && Lcm % 70 == 0)
    (1 to 10).foreach(d => assert(Lcm % (60 + d) == 0))
  }

  test("k cuts the fused list, not the inputs") {
    val a = list((1 to 10).map(i => (1L, i.toLong, i)): _*)
    val r = fuse(Seq(a), k = 3)
    assert(r.keySet == Set(1L, 2L, 3L))
    assert(r(1L)._3 == 1L && r(3L)._3 == 3L)
  }

  test("out-of-range ranks fail fast") {
    val ex = intercept[Exception] {
      fuse(Seq(list((1L, 1L, 11))))
    }
    assert(ex.getMessage == null || ex.toString.nonEmpty)
  }

  test("LCM overflow guard rejects an unpayable k0/maxRank combination") {
    intercept[IllegalArgumentException] {
      Scoring.rrfFuse(Seq(list((1L, 1L, 1))), k0 = 1000003L, maxRank = 10, k = 10)
    }
  }
}
