package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k as an AGGREGATE: per group, keep the `k` (score, id)
  * pairs with the highest score (ties -> lowest id), emitted best-first as
  * an array of structs.
  *
  * Why an aggregate and not a rank window: `row_number() OVER
  * (PARTITION BY query ORDER BY score DESC) <= k` must shuffle and sort
  * EVERY candidate row. A TypedImperativeAggregate gets map-side partial
  * aggregation — each map partition reduces its candidates to a k-bounded
  * heap before the shuffle, so the exchange carries O(k) rows per group
  * per partition instead of all of them. For ANN ranking (millions of
  * probes x hundreds of candidates each) that is the difference between
  * shuffling the candidate blowup and shuffling the answer.
  *
  * Ordering parity with the window form AND external SQL `ROW_NUMBER`
  * oracles: `java.lang.Double.compare` semantics (NaN sorts greater than
  * +Inf — Spark's and DuckDB's DESC-first behavior), ties on score break
  * to the LOWER id. Null scores/ids are skipped (a window's ROW_NUMBER
  * would rank them; callers here never produce null cosines for non-null
  * vectors).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k_by_score"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckSuccess
      case (s, i) => TypeCheckFailure(
        s"$prettyName requires (double score, bigint id), got (${s.catalogString}, ${i.catalogString})")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buffer.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.foreach((s, i) => buffer.offer(s, i))
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val best = buffer.sortedBestFirst()
    new GenericArrayData(best.map { case (s, i) => InternalRow(s, i): Any })
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val items = buffer.sortedBestFirst()
    out.writeInt(items.length)
    items.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.offer(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

/** k-bounded worst-first heap of (score, id): the root is the CURRENT
  * WORST kept pair, so a better candidate replaces it in O(log k).
  * "Better" = higher score via `Double.compare` (NaN greatest), tie ->
  * lower id.
  */
final class TopKBuffer(k: Int) {
  /** worst-first: the head is the pair every candidate must beat */
  private val heap = new java.util.PriorityQueue[(Double, Long)](k, {
    (x: (Double, Long), y: (Double, Long)) =>
      val c = java.lang.Double.compare(x._1, y._1)
      if (c != 0) c else java.lang.Long.compare(y._2, x._2)
  })

  private def beats(s: Double, i: Long, worst: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(s, worst._1)
    c > 0 || (c == 0 && i < worst._2)
  }

  def offer(s: Double, i: Long): Unit =
    if (heap.size < k) heap.offer((s, i))
    else if (beats(s, i, heap.peek())) { heap.poll(); heap.offer((s, i)) }

  def foreach(f: (Double, Long) => Unit): Unit =
    heap.forEach(p => f(p._1, p._2))

  def sortedBestFirst(): Array[(Double, Long)] = {
    val arr = new Array[(Double, Long)](heap.size)
    heap.toArray(arr)
    scala.util.Sorting.stableSort(arr, (x: (Double, Long), y: (Double, Long)) => {
      val c = java.lang.Double.compare(y._1, x._1)
      c < 0 || (c == 0 && x._2 < y._2)
    })
    arr
  }
}
