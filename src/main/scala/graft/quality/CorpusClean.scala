package graft.quality

import graft.functions.Text
import graft.operators.{Boundary, Dedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed corpus-cleaning pipeline — the operators chained the way a
  * production training-data build runs them: quality-gate on the RAW text
  * (filter first — never pay the redaction regexes for docs that get
  * dropped) -> whitespace-normalize + PII-redact the survivors -> exact
  * dedup (min doc_id per cleaned text) -> simhash near-dup pairs ->
  * connected-components cluster resolution -> keep canonical docs.
  *
  * Mirrors the cleaning sweep of reference feature builds (cf.
  * `/root/reference/src/pipelines/features/build_defi_features.py`'s
  * stage -> dedup -> persist shape) generalized to an LLM corpus.
  */
object CorpusClean {

  /** Returns the canonical (doc_id, n_tokens) survivors of `docs(doc_id,
    * text)`.
    *
    * `boundary` materializes the cleaned canonical corpus ONCE: the
    * regex-redaction chain feeds four downstream consumers (pair sketching,
    * the cluster join, token counting) and would otherwise re-run per
    * consumer. [[graft.operators.Boundary.Local]] is the single-app
    * default; a 100 TB deployment passes [[graft.operators.Boundary.AtPath]]
    * so the boundary IS the persisted cleaned corpus (surviving executor
    * loss and feeding later stages for free). Results are identical under
    * either (CorpusCleanSpec asserts it).
    */
  def pipeline(docs: DataFrame, boundary: Boundary = Boundary.Local): DataFrame =
    canonicalDocs(docs, boundary)
      .select(col("doc_id"), Text.tokenCount(col("clean")).cast("long").as("n_tokens"))

  /** The pipeline's canonical SURVIVORS with their cleaned text —
    * (doc_id, clean) — for consumers that need the text itself (tokenizer
    * training, packing on real token counts, export), not just the
    * whitespace count summary [[pipeline]] reduces it to.
    */
  def canonicalDocs(docs: DataFrame, boundary: Boundary = Boundary.Local): DataFrame = {
    val gated0 = docs.filter(Text.qualityScore(col("text")) >= 0.6)
    val gated = gated0.select(col("doc_id"),
      Text.redactPii(Text.normalizeWhitespace(col("text"))).as("clean"))
    // exact dedup in ONE digest-keyed shuffle: group on the 16-byte md5
    // (map-side partials collapse local copies) with a min_by carrying
    // the canonical row — no second pass over the corpus, no re-join.
    val exact = boundary(gated.groupBy(md5(col("clean")).as("__d"))
      .agg(min_by(struct(col("doc_id"), col("clean")), col("doc_id")).as("__r"))
      .select(col("__r.doc_id").as("doc_id"), col("__r.clean").as("clean")))
    val pairs = Dedup.simhashPairs(exact, "doc_id", "clean",
      maxHamming = 3, tokenHash = Dedup.Md5ShingleHash, boundary = boundary)
    val cc = Dedup.connectedComponents(pairs, "doc_id_1", "doc_id_2")
      .withColumnRenamed("node", "doc_id")
    exact.join(cc, Seq("doc_id"), "left")
      .filter(coalesce(col("cluster"), col("doc_id")) === col("doc_id"))
      .select(col("doc_id"), col("clean"))
  }

  /** [[pipeline]] over a WEB CRAWL: `docs(doc_id, html)` goes through
    * [[graft.functions.Text.extractHtmlText]] first (boilerplate strip +
    * entity decode), then the identical gate -> redact -> dedup -> cluster
    * chain. The extraction is one more codegen'd projection fused into the
    * same scan as the quality gate — ingesting raw HTML costs no extra
    * pass or shuffle over ingesting clean text.
    */
  def pipelineHtml(docs: DataFrame, boundary: Boundary = Boundary.Local): DataFrame =
    pipeline(
      docs.select(col("doc_id"), Text.extractHtmlText(col("html")).as("text")),
      boundary)

  /** [[canonicalDocs]] over a raw crawl — HTML extraction first, then the
    * identical chain; survivors keep their cleaned text.
    */
  def canonicalDocsHtml(docs: DataFrame, boundary: Boundary = Boundary.Local): DataFrame =
    canonicalDocs(
      docs.select(col("doc_id"), Text.extractHtmlText(col("html")).as("text")),
      boundary)
}
