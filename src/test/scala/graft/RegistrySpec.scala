package graft

import graft.registry.Registry
import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene at 110+ queries — the structural invariants that let
  * the driver's correctness gate mean what it claims (round-5 verdict
  * directive #7): no name collisions hiding a query, no bench entry
  * silently outside the oracle gate, no stale CORRECTNESS row pointing at
  * a query that no longer exists.
  */
class RegistrySpec extends AnyFunSuite {

  /** Queries deliberately without a DuckDB oracle, each with the reason
    * the rows-only check is the best available — additions here need the
    * same scrutiny the originals got.
    */
  private val sanctionedRowsOnly: Map[String, String] = Map.empty
  // (round 7: the last entry, dedup_minhash_lsh, got a planted-pair BOUND
  // oracle — recall + verify-consistency booleans DuckDB asserts TRUE —
  // so every registry row is now oracle-or-bound checked)

  test("query names are unique") {
    val dups = Registry.all.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate registry names: ${dups.mkString(", ")}")
  }

  test("every query has an oracle or a sanctioned rows-only reason") {
    val unsanctioned = Registry.all
      .filter(q => q.oracle.isEmpty && !sanctionedRowsOnly.contains(q.name))
      .map(_.name)
    assert(unsanctioned.isEmpty,
      s"queries without an oracle and without a documented reason: ${unsanctioned.mkString(", ")}")
  }

  test("every bench query is under the oracle gate (or sanctioned)") {
    val loose = Registry.all
      .filter(q => q.bench && q.oracle.isEmpty && !sanctionedRowsOnly.contains(q.name))
      .map(_.name)
    assert(loose.isEmpty, s"bench queries outside the gate: ${loose.mkString(", ")}")
  }

  test("sanctioned rows-only entries are live registry names") {
    val dead = sanctionedRowsOnly.keySet -- Registry.byName.keySet
    assert(dead.isEmpty, s"sanction list references dead queries: ${dead.mkString(", ")}")
  }

  test("the latest CORRECTNESS report maps 1:1 onto live registry entries") {
    val reports = new java.io.File("/root/repo").listFiles()
      .filter(f => f.getName.matches("CORRECTNESS_r\\d+\\.json")).sortBy(_.getName)
    assume(reports.nonEmpty, "no driver correctness report committed yet")
    val txt = new String(java.nio.file.Files.readAllBytes(reports.last.toPath), "UTF-8")
    // keys are top-level "name": { ... } — names never contain quotes
    val keys = "\"([a-z0-9_]+)\"\\s*:\\s*\\{".r.findAllMatchIn(txt).map(_.group(1)).toSet
    val stale = keys -- Registry.byName.keySet
    assert(stale.isEmpty,
      s"${reports.last.getName} rows with no live registry entry: ${stale.mkString(", ")}")
    // and the report should not have silently missed queries that existed
    // then — new queries added THIS round are expected to be absent
    assert(keys.nonEmpty)
  }

  test("planView is present exactly where run() crosses a boundary (spot contract)") {
    // the boundary-crossing queries — keep in sync when a new operator
    // takes a Boundary parameter with a Local default (r7 added the four
    // simhashPairs-derived programs when its persist became a boundary)
    val expected = Set("feature_assembly", "dedup_semantic", "pipeline_corpus_clean",
      "pipeline_corpus_clean_html", "pipeline_training_build", "pipeline_training_build_bpe",
      "dedup_exact_bloom_ingest", "dedup_minhash_lsh", "dedup_minhash_lsh_md5",
      "dedup_minhash_incremental", "text_tfidf_topterms",
      "dedup_simhash_pairs", "dedup_cluster_assign", "dedup_cluster_keep_best",
      "dedup_cluster_split",
      // r10: the perceptual near-dup family routes hammingPairs64's
      // signature boundary
      "dedup_image_neardup", "dedup_audio_neardup", "dedup_media_neardup_clusters",
      // r10: bm25's inverted index is tf-materialized (three consumers)
      "text_bm25_retrieve",
      // r10: hybrid fusion routes bm25Retrieve, so it inherits the boundary
      "text_hybrid_retrieve",
      // r10: the LSH-vs-exact eval routes minhashLsh's signature boundary,
      // the leakage audit routes simhashPairs'
      "eval_lsh_dedup", "eval_split_leakage",
      // r11: the bloom join's filter build is a tiny aggregate action —
      // the lazy twin is the PLAIN join (bloom-free), value-identical by
      // the no-false-negatives argument
      "join_bloom_filtered",
      // r12: the pixel-level near-dup family routes hammingPairs64's
      // signature boundary like the byte-level family
      "dedup_image_pixel_neardup", "dedup_image_pixel_clusters",
      // r13: the JPEG pixel family routes the same boundary
      "dedup_jpeg_pixel_neardup", "dedup_jpeg_pixel_clusters",
      // r13: the GIF, audio-envelope, and video poster-frame families
      // route the same hammingPairs64 signature boundary
      "dedup_gif_pixel_neardup", "dedup_gif_pixel_clusters",
      "dedup_audio_content_neardup", "dedup_audio_content_clusters",
      "dedup_video_frame_neardup", "dedup_video_frame_clusters",
      // r14: the WebP pixel and WAV<->FLAC cross-container families route
      // the same hammingPairs64 signature boundary
      "dedup_webp_pixel_neardup", "dedup_webp_pixel_clusters",
      "dedup_flac_audio_neardup", "dedup_flac_audio_clusters",
      // r15: the lossy-VP8 family routes the same boundary
      "dedup_webp_lossy_neardup", "dedup_webp_lossy_clusters")
    val got = Registry.all.filter(_.planView.isDefined).map(_.name).toSet
    assert(got == expected,
      s"planView coverage drifted; missing=${(expected -- got).mkString(",")} extra=${(got -- expected).mkString(",")}")
  }
}
