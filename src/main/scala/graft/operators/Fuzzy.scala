package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) join — the entity-resolution primitive the n-gram
  * Jaccard family does not cover: Jaccard measures shared-shingle MASS
  * (long-text near-dup), edit distance measures CHARACTER surgery
  * (misspelled names, OCR noise, address variants — short strings where
  * one typo moves Jaccard a lot).
  *
  * Blocking is the classic PREFIX FILTER over q-grams, which is EXACT (no
  * false negatives), unlike a df-capped posting join: each edit operation
  * changes at most `q` distinct q-grams, so `ed(s,t) <= d` implies
  * `|G(s) ∩ G(t)| >= max(|G|) - d*q`; by the prefix-filter theorem, two
  * sets intersecting that much must already intersect within their first
  * `d*q + 1` grams under ANY shared global gram order. We order grams
  * rarest-first (corpus df ascending, gram ascending as the tiebreak), so
  * every string posts only its `d*q + 1` RAREST grams — the posting lists
  * that drive the candidate join are exactly the ones with the smallest
  * df, which is what bounds Σdf² at 100 TB (a stop-gram like "th" never
  * joins unless it is one of a string's rarest grams, i.e. essentially
  * never). Strings too short to own `d*q + 1` grams (`|G| <= d*q`, where
  * a within-distance pair can share ZERO grams) go through a length-band
  * sidecar instead: |len(s) - len(t)| <= d is necessary for ed <= d, and
  * the band join is keyed (2d+1 exploded length keys — an equi join, not
  * a theta join). Candidates verify with Spark's thresholded
  * `levenshtein(l, r, d)` (O(d·len) early-exit, not O(len²)).
  *
  * Scale shape: one df aggregate over grams, one per-string top-(dq+1)
  * window (partitioned by string id — tiny partitions), one posting
  * equi-join, one keyed band join on the short sidecar, one verify
  * projection. Nothing pairwise outside the posting lists.
  */
object Fuzzy {

  /** Distinct q-grams of `s` (empty array below length q). */
  private def grams(s: Column, q: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(s) - (q - 1), lit(0))),
      i => s.substr(i, lit(q))))

  /** All pairs `(idl, idr, dist)` with `levenshtein(sl, sr) <= maxDist`.
    * Left/right may be the same table (callers drop the diagonal). Null
    * strings never match.
    */
  def editDistanceJoin(
      left: DataFrame, right: DataFrame,
      idL: String, sL: String, idR: String, sR: String,
      maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    require(q >= 1, "q must be >= 1")
    val p = maxDist * q + 1
    val L = left.select(col(idL).as("idl"), col(sL).as("sl")).filter(col("sl").isNotNull)
    val R = right.select(col(idR).as("idr"), col(sR).as("sr")).filter(col("sr").isNotNull)

    val gl = L.select(col("idl"), explode(grams(col("sl"), q)).as("g"))
    val gr = R.select(col("idr"), explode(grams(col("sr"), q)).as("g"))
    // corpus-wide gram document frequency -> the shared global gram order
    val dfc = gl.select("g").unionAll(gr.select("g"))
      .groupBy("g").agg(count(lit(1)).as("df"))

    import org.apache.spark.sql.expressions.Window
    def prefix(side: DataFrame, id: String): DataFrame = {
      val w = Window.partitionBy(id).orderBy(col("df"), col("g"))
      side.join(dfc, "g")
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= p)
        .select(col(id), col("g"))
    }
    val candGrams = prefix(gl, "idl").join(prefix(gr, "idr"), "g")
      .select("idl", "idr")

    // short-string sidecar: |G| <= d*q can share zero grams within
    // distance d — block those by the length band instead (keyed join on
    // 2d+1 exploded length keys; necessary condition |len diff| <= d)
    val offsets = array((-maxDist to maxDist).map(lit): _*)
    def bandKeysOf(s: Column): Column = transform(offsets, o => length(s) + o)
    val shortL = L.filter(size(grams(col("sl"), q)) <= maxDist * q)
    val shortR = R.filter(size(grams(col("sr"), q)) <= maxDist * q)
    val candShortL = shortL.select(col("idl"), explode(bandKeysOf(col("sl"))).as("lk"))
      .join(R.select(col("idr"), length(col("sr")).as("lk")), "lk")
      .select("idl", "idr")
    val candShortR = L.select(col("idl"), length(col("sl")).as("lk"))
      .join(shortR.select(col("idr"), explode(bandKeysOf(col("sr"))).as("lk")), "lk")
      .select("idl", "idr")

    val cand = candGrams.unionAll(candShortL).unionAll(candShortR).distinct()
    cand
      .join(L, "idl").join(R, "idr")
      .withColumn("dist", levenshtein(col("sl"), col("sr"), maxDist).cast("long"))
      .filter(col("dist") =!= -1L)
      .select(col("idl"), col("idr"), col("dist"))
  }
}
