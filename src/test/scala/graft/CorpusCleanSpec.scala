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
}
