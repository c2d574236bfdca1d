package org.apache.spark.sql.graftnative

import org.apache.spark.sql.types.StructType

/** Thin access to Spark's `private[sql]` parquet-style schema merge —
  * the same rules `mergeSchema=true` applies per file footer, used by
  * the bucketed-snapshot manifest to maintain its recorded `#schema=`
  * header across evolving commits (existing fields keep position and
  * merged types, new fields append).
  */
object SchemaOps {
  def merge(base: StructType, update: StructType): StructType =
    base.merge(update)
}
