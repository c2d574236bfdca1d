package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (popular tokens / whale wallets —
  * SURVEY.md §4 flags both as real skew at 100 TB). AQE's skew-join split
  * handles sort-merge cases adaptively; explicit salting is the
  * deterministic fallback for the worst hitters and for shuffled-hash
  * paths AQE won't split.
  */
object Skew {

  /** Salted inner equi-join: the big (skewed) left side gets a
    * deterministic salt in [0, nSalts) derived from `saltFrom` (any
    * roughly-unique left column — row content, not the join key), and the
    * small-to-medium right side is replicated once per salt value. The
    * join key becomes (key, salt), so one hot key fans out across nSalts
    * shuffle partitions instead of one straggler task.
    *
    * Result is row-identical to `left.join(right, key)` — replication adds
    * no matches because each left row carries exactly one salt.
    */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFrom: String,
      nSalts: Int): DataFrame = {
    require(nSalts >= 1)
    val salted = left.withColumn("__salt", pmod(xxhash64(col(saltFrom)), lit(nSalts)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(nSalts - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
