package graft

import graft.operators.{Boundary, Dedup}
import graft.quality.CorpusClean
import org.apache.spark.sql.functions._

/** Boundary pluggability: every materialization strategy (none /
  * localCheckpoint / persist-to-path) must produce the IDENTICAL result —
  * the boundary only decides where the intermediate bytes live, never what
  * they are. Run over the real sf0.001 documents table so the pipeline
  * crosses its real stages.
  */
class CorpusCleanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    import spark.implicits._
    df.as[(Long, Long)].collect().toSet
  }

  test("corpus-clean pipeline: Local and AtPath boundaries hash identically") {
    graft.sources.Tables.configure(spark)
    val docs = graft.sources.Tables.documents(spark, sf).select("doc_id", "text")
    val local = rows(CorpusClean.pipeline(docs, Boundary.Local))
    val tmp = "target/tmp/corpusclean_boundary"
    val stored = rows(CorpusClean.pipeline(docs, Boundary.AtPath(tmp)))
    assert(local == stored, "storage boundary must not change the result")
    assert(local.nonEmpty)
    // the AtPath boundary really is a parquet table at rest
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(tmp + "/b0")))
  }

  test("minhashLsh: None, Local and AtPath boundaries agree pair-for-pair") {
    graft.sources.Tables.configure(spark)
    val docs = graft.sources.Tables.documents(spark, sf).select("doc_id", "text")
    def pairs(b: Boundary): Set[(Long, Long)] = {
      import spark.implicits._
      Dedup.minhashLsh(docs, "doc_id", "text", n = 3, k = 64, bands = 16,
        threshold = 0.5, boundary = b)
        .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    }
    val lazyP = pairs(Boundary.None)
    val localP = pairs(Boundary.Local)
    val storedP = pairs(Boundary.AtPath("target/tmp/minhashlsh_boundary"))
    assert(lazyP == localP && localP == storedP)
  }

  test("gopherRules: top-gram mass fractions and keep rule on crafted docs") {
    import spark.implicits._
    val docs = Seq(
      // 12 distinct-ish words, top word 'alpha' x2 of 12 -> uni 2/12, top bigram unique
      (1L, "alpha beta gamma delta alpha epsilon zeta eta theta iota kappa lambda"),
      // pathological: one word repeated 20x -> uni 1.0, bigram 1.0
      (2L, Seq.fill(20)("spam").mkString(" ")),
      // below min words (3): word-count bound alone must reject
      (3L, "tiny doc here"),
      // empty text: zero words, fractions defined 0.0, rejected by count
      (4L, "   "))
      .toDF("doc_id", "text")
    val got = graft.quality.Scoring.gopherRules(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    // doc1 fails both mass thresholds (uni 2/12 > 0.10; bi 1/11 > 0.05)
    assert(got(0) == ((1L, 12L, 2.0 / 12.0, 1.0 / 11.0, false)), s"doc1 ${got(0)}")
    assert(got(1) == ((2L, 20L, 1.0, 1.0, false)))
    assert(got(2)._2 == 3L && !got(2)._5, "3-word doc rejected by word-count bound")
    assert(got(3) == ((4L, 0L, 0.0, 0.0, false)), "empty text: fractions 0, rejected")
    // a healthy doc passes: 40 distinct words (uni 1/40, bi 1/39 — both
    // under threshold, length bounds satisfied)
    val ok = graft.quality.Scoring.gopherRules(
      Seq((9L, (1 to 40).map(i => s"word$i").mkString(" "))).toDF("doc_id", "text"),
      "doc_id", "text").head()
    assert(ok.getBoolean(5), "distinct-word doc must keep")
  }
}
