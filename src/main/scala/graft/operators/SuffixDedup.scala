package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EXACT-SUBSTRING dedup via a DISTRIBUTED SUFFIX ARRAY — the true
  * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
  * Better") form the k-gram-window machinery approximates: find every
  * token position covered by a duplicated substring of >= `minTokens`
  * tokens, as adjacent-suffix LCPs over the concatenated corpus.
  *
  * Construction is PREFIX DOUBLING, O(n log n) total work in O(log n)
  * rounds (the scale gate measures the exponent):
  *
  *  1. one global position per token (per-doc offsets by a TWO-PHASE
  *     distributed prefix sum over the doc-length frame — per-partition
  *     subtotals, a partition-count-sized prefix on the driver, then
  *     per-partition running sums; never a single-partition window),
  *     with a UNIQUE boundary sentinel after each doc so no suffix
  *     match crosses a document's end while cross-document boilerplate
  *     still matches;
  *  2. initial ranks = dense rank of the token string (one distributed
  *     sort via `sortBy + zipWithIndex` — never a single-partition
  *     window);
  *  3. each round pairs `rank(i)` with `rank(i + h)` (a shifted
  *     self-join on position) and DENSE-RE-RANKS the pairs in one
  *     distributed range sort — rank = key changes strictly before the
  *     row, assigned from driver-collected per-partition edge summaries
  *     (first/last key + change count; the two-phase shape again) —
  *     doubling `h` until every rank is unique; one n-row shuffle per
  *     round, no distinct pass, no rank join-back;
  *  4. suffix order = sort by final rank; each adjacent pair's LCP is
  *     recovered from the SAVED round ranks by the classic descending-
  *     powers walk (log n small joins over the n-1 adjacent pairs — no
  *     quadratic rescan of text);
  *  5. a suffix whose neighbor LCP `L >= minTokens` contributes the
  *     covered interval `[i, i+L)`; the union of those intervals is
  *     EXACTLY the union of duplicated `minTokens`-windows (maximality
  *     of nearest-neighbor LCP in suffix order), which is what the SQL
  *     oracle re-derives independently.
  *
  * Output: `(doc_id, n_tokens, covered_tokens)` — the per-document
  * duplicated-span coverage the span-removal assembler consumes.
  *
  * 100 TB: every step is a shuffle-on-key or a distributed sort; round
  * count grows with log of corpus length, per-round cost is linear.
  * Token payloads leave the scan once (as ranks); text never re-shuffles.
  */
object SuffixDedup {

  def duplicateSpanCoverage(
      docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int): DataFrame = {
    require(minTokens >= 2, "minTokens must be >= 2")
    val spark = docs.sparkSession
    import spark.implicits._

    // ---- 1. global positions + unique per-doc boundary sentinels ----
    val toks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        split(trim(col(textCol)), "\\s+").as("ws"))
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)
    // per-doc offsets: TWO-PHASE distributed prefix sum over the
    // doc-length frame in doc_id order (the sel_curriculum_interleave
    // ranking pattern) — a global Window.orderBy here would funnel every
    // doc length through ONE task, the classic 10^9-doc straggler
    val lensSorted = toks.groupBy("doc_id")
      .agg((max("pos") + 1).cast("long").as("len"))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1) // distributed range sort by doc_id (ascending)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // phase 1: per-partition subtotals — partition-count-sized collect
    val partTotals = lensSorted.mapPartitionsWithIndex { case (i, it) =>
      var s = 0L; it.foreach(s += _._2 + 1L) // +1: the boundary sentinel slot
      Iterator(i -> s)
    }.collect().toMap
    val partBase = {
      val nParts = lensSorted.getNumPartitions
      val arr = new Array[Long](nParts)
      var acc = 0L; var i = 0
      while (i < nParts) { arr(i) = acc; acc += partTotals.getOrElse(i, 0L); i += 1 }
      arr
    }
    // phase 2: running offsets within each partition from its base
    val docLens = spark.createDataFrame(
      lensSorted.mapPartitionsWithIndex { case (i, it) =>
        var off = partBase(i)
        it.map { case (d, l) => val o = off; off += l + 1L; (d, l, o) }
      }).toDF("doc_id", "len", "off")
      .localCheckpoint(true) // consumed 3x: position join, sentinels, output
    lensSorted.unpersist(false)
    // plain keyed join (no broadcast hint): docLens is doc-count-sized —
    // AQE broadcasts it when small, shuffles when a billion docs make a
    // driver-sized broadcast the actual hazard
    val positioned = toks.join(docLens.select("doc_id", "off"), "doc_id")
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        (col("off") + col("pos")).as("g"), col("tok"))

    // initial ranks: dense rank of token string (vocabulary-sized sort);
    // sentinels get UNIQUE ranks above every real token's
    val tokRanks = {
      val distinctToks = positioned.select("tok").distinct()
      val ranked = distinctToks.rdd.map(_.getString(0)).sortBy(identity)
        .zipWithIndex().map { case (t, i) => (t, i) }
      spark.createDataFrame(ranked).toDF("tok", "r").localCheckpoint(true)
    }
    val nTokRanks = tokRanks.count()
    val nDocs = docLens.count()
    val sentinels = docLens.select(
      col("doc_id"), lit(null).cast("string").as("tok"),
      (col("off") + col("len")).as("g"), lit(-1L).as("pos"))
      .withColumn("r", lit(nTokRanks) + col("doc_id"))
      .select(col("doc_id"), col("pos"), col("g"), col("r"))
    // localCheckpoint: each round's LINEAGE is truncated — 15+ stacked
    // self-joins would otherwise grow the logical plan geometrically and
    // exhaust the driver during analysis, long before data size matters
    var rank = positioned.join(tokRanks, "tok")
      .select(col("doc_id"), col("pos"), col("g"), col("r"))
      .unionByName(sentinels)
      .localCheckpoint(true)
    val n = rank.count()
    tokRanks.unpersist() // consumed only by the materialized initial ranks

    // ---- 2/3. prefix doubling; keep each round for the LCP walk ----
    val rounds = scala.collection.mutable.ArrayBuffer.empty[(Long, DataFrame)]
    rounds += 0L -> rank // h=1 ranks under key "first 1 token" (power index by shift h)
    var h = 1L
    // initial distinct-rank count is KNOWN (token ranks are dense
    // 0..nTokRanks-1, sentinel ranks nTokRanks+doc_id all unique) — no
    // distinct pass; per round it falls out of the pair-rank frame's own
    // count, saving one full distinct+count over n positions per round
    var distinctRanks = nTokRanks + nDocs
    while (distinctRanks < n) {
      val shifted = rank.select((col("g") - h).as("g"), col("r").as("r2"))
      val paired = rank.join(shifted, Seq("g"), "left")
        .select(col("doc_id"), col("pos"), col("g"), col("r"),
          coalesce(col("r2"), lit(-1L)).as("r2"))
      // dense re-rank in ONE distributed range sort of the positions by
      // their pair key — rank = number of key CHANGES strictly before the
      // row, assigned per partition from driver-collected edge summaries
      // (first/last key + change count per partition: the same two-phase
      // shape as the offset step). This replaces the r15 round body's
      // distinct(n) -> sort(distinct) -> zipWithIndex -> JOIN-BACK(n by
      // (r, r2)) pipeline: two full-frame shuffles and a second execution
      // of the pair join gone per round (~2x the round constant), and the
      // new distinct-rank count falls out of the same edge summaries.
      val keyed = paired.rdd
        .map(r => ((r.getLong(3), r.getLong(4)), (r.getLong(0), r.getLong(1), r.getLong(2))))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sortedRdd = keyed.sortByKey(ascending = true)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val edges = sortedRdd.mapPartitionsWithIndex { case (i, it) =>
        var first: (Long, Long) = null
        var last: (Long, Long) = null
        var changes = 0L
        it.foreach { case (k, _) =>
          if (first == null) first = k
          else if (k != last) changes += 1
          last = k
        }
        Iterator(i -> ((first, last, changes)))
      }.collect().toMap
      val nParts = sortedRdd.getNumPartitions
      val base = new Array[Long](nParts) // rank of each partition's first row
      var acc = 0L                       // rank of the last key seen so far
      var prevLast: (Long, Long) = null
      var p = 0
      while (p < nParts) {
        edges.get(p).filter(_._1 != null).foreach { case (first, last, changes) =>
          if (prevLast != null && first != prevLast) acc += 1
          base(p) = acc
          acc += changes
          prevLast = last
        }
        if (edges.get(p).forall(_._1 == null)) base(p) = acc // empty partition
        p += 1
      }
      distinctRanks = if (prevLast == null) 0L else acc + 1
      val next = spark.createDataFrame(
        sortedRdd.mapPartitionsWithIndex { case (i, it) =>
          var r = base(i)
          var prev: (Long, Long) = null
          it.map { case (k, (docId, pos, g)) =>
            if (prev != null && k != prev) r += 1
            prev = k
            (docId, pos, g, r)
          }
        }).toDF("doc_id", "pos", "g", "r")
        .localCheckpoint(true)
      keyed.unpersist(false)
      sortedRdd.unpersist(false) // round-scoped; keeping it is the r15 OOM shape
      h *= 2
      rounds += h -> next // ranks under "first 2h'... " key: shift to pair = h
      rank = next
    }

    // ---- 4. adjacent pairs in suffix order, LCP by descending powers ----
    // suffix order: global sort by final rank (ranks are unique)
    val ordered = rank.select(col("g"), col("r"))
    val adjacency = {
      val sorted = ordered.rdd.map(r => (r.getLong(1), r.getLong(0))).sortByKey()
        .map(_._2).zipWithIndex().map { case (g, i) => (i, g) }
      val a = spark.createDataFrame(sorted).toDF("i", "ga")
      val b = spark.createDataFrame(sorted).toDF("ib", "gb")
      a.join(b.withColumn("i", col("ib") - 1).drop("ib"), "i")
        .select(col("ga"), col("gb"))
    }
    // walk saved rounds high->low: extend the common prefix wherever the
    // round's ranks agree at the current lcp offset
    var pairs = adjacency.withColumn("lcp", lit(0L)).localCheckpoint(true)
    rounds.reverse.foreach { case (span, rdf) =>
      val width = math.max(span, 1L) // round h covers h tokens (h=0 entry covers 1)
      val ra = rdf.select(col("g").as("qa"), col("r").as("rka"))
      val rb = rdf.select(col("g").as("qb"), col("r").as("rkb"))
      val next = pairs
        .withColumn("qa", col("ga") + col("lcp"))
        .withColumn("qb", col("gb") + col("lcp"))
        .join(ra, Seq("qa"), "left")
        .join(rb, Seq("qb"), "left")
        .withColumn("lcp",
          when(col("rka").isNotNull && col("rkb").isNotNull &&
            col("rka") === col("rkb"), col("lcp") + width)
            .otherwise(col("lcp")))
        .select("ga", "gb", "lcp")
        .localCheckpoint(true)
      pairs.unpersist()
      pairs = next
    }

    // neighbor LCP per suffix = max over its two order-neighbors
    val neighborLcp = pairs.select(col("ga").as("g"), col("lcp"))
      .unionByName(pairs.select(col("gb").as("g"), col("lcp")))
      .groupBy("g").agg(max("lcp").as("nl"))
      .filter(col("nl") >= minTokens)

    // ---- 5. spans back to (doc, pos); merge + count coverage ----
    val spans = rank.select(col("doc_id"), col("pos"), col("g"))
      .filter(col("pos") >= 0) // sentinels out
      .join(neighborLcp, "g")
      .select(col("doc_id"), col("pos").as("s"),
        (col("pos") + col("nl")).as("e")) // [s, e) in doc-token coords
    // boundary sentinel guarantees e never crosses the doc end
    val covered = spans
      .select(col("doc_id"), explode(sequence(col("s"), col("e") - 1)).as("p"))
      .groupBy("doc_id").agg(countDistinct("p").as("covered_tokens"))
    val out = docLens.select(col("doc_id"), col("len").as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
      // materialize the (doc-count-sized) result, then FREE the round
      // checkpoints — without this, repeated invocations accumulate every
      // round's block storage and eventually OOM the executors
      .localCheckpoint(true)
    rounds.foreach(_._2.unpersist())
    pairs.unpersist()
    docLens.unpersist()
    out
  }
}
