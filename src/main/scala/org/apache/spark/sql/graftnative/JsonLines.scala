package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** JSONL -> InternalRow glue for graft's paged connector
  * ([[graft.sources.Paged]]).
  *
  * Lives under `org.apache.spark.sql` because [[JacksonParser]] /
  * [[JSONOptions]] — the exact decode path of Spark's built-in json file
  * source — are `private[sql]`. Reusing them (rather than hand-rolling a
  * Jackson mapping) keeps the connector's type coercions (long / double /
  * string / null) BYTE-IDENTICAL to what `spark.read.json` would produce,
  * so a page payload and a jsonl file of the same records decode to the
  * same rows.
  */
object JsonLines {

  /** A per-task line parser for `schema`. Parse only materializes the
    * fields `schema` names — column pruning at the decode level, the
    * connector's analogue of parquet `ReadSchema` pruning.
    *
    * Malformed lines are DROPPED (and counted by the caller if it cares):
    * the fixture/server contract is machine-written JSONL, so a bad line
    * is transport corruption, not data — same posture as PERMISSIVE mode
    * with no corrupt-record column. Never throws.
    */
  def parserFor(schema: StructType, timeZoneId: String): String => Iterator[InternalRow] = {
    val opts = new JSONOptions(Map.empty[String, String], timeZoneId, "")
    val parser = new JacksonParser(schema, opts, allowArrayAsStructs = false, Seq.empty)
    val create = CreateJacksonParser.string _
    line => {
      if (line == null || line.isEmpty) Iterator.empty
      else {
        try parser.parse[String](line, create, UTF8String.fromString).iterator
        catch { case _: Exception => Iterator.empty }
      }
    }
  }
}
