package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** Bounded top-k as a NATIVE aggregate — the ranking shape IVF candidate
  * selection actually needs. `row_number().over(partitionBy(qid))` ranks by
  * sorting every candidate row (WindowGroupLimit still sorts each input
  * partition before pruning); this aggregate keeps a k-sized insertion
  * buffer per group instead — O(n·log k) with NO sort and map-side partial
  * merge, so only nPartitions×k tiny buffers reach the exchange. Same
  * ordering contract as the window path: ascending (distance, id),
  * rank = 1-based position.
  *
  * The reference's equivalent is the fixed-capacity result heap its search
  * loop maintains (`hnsw_index.go` candidate heap); this is that structure
  * as a Catalyst `TypedImperativeAggregate`, which Spark runs through
  * ObjectHashAggregate. NOTE for large query batches: raise
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (default
  * 128 groups) to keep the hash path; the fallback stays correct but pays
  * a by-qid sort.
  */
final class TopKBuffer(val k: Int) {
  val ids: Array[Long] = new Array[Long](k)
  val ds: Array[Double] = new Array[Double](k)
  var n: Int = 0

  /** Insert (id, d) if it beats the current worst; keeps the buffer sorted
    * ascending by (d, id). Ties on distance break toward the LOWER id —
    * identical to `orderBy(distance, id)` + row_number.
    */
  def insert(id: Long, d: Double): Unit = {
    if (n == k) {
      val wd = ds(k - 1)
      if (d > wd || (d == wd && id >= ids(k - 1))) return
    }
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ds(mid) < d || (ds(mid) == d && ids(mid) < id)) lo = mid + 1
      else hi = mid
    }
    if (lo >= k) return
    val move = math.min(n, k - 1) - lo
    if (move > 0) {
      System.arraycopy(ids, lo, ids, lo + 1, move)
      System.arraycopy(ds, lo, ds, lo + 1, move)
    }
    ids(lo) = id
    ds(lo) = d
    if (n < k) n += 1
  }
}

case class TopKByDistance(
    idExpr: Expression,
    distExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with org.apache.spark.sql.graft.TypedInputs {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(idExpr, distExpr)
  override def expectedInputTypes: Seq[DataType] = Seq(LongType, DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("distance", DoubleType, nullable = false),
      StructField("rank", IntegerType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val idV = idExpr.eval(input)
    val dV = distExpr.eval(input)
    if (idV != null && dV != null)
      b.insert(idV.asInstanceOf[Long], dV.asInstanceOf[Double])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < o.n) { b.insert(o.ids(i), o.ds(i)); i += 1 }
    b
  }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(Array.tabulate[Any](b.n) { i =>
      InternalRow(b.ids(i), b.ds(i), i + 1)
    })

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * b.n)
    bb.putInt(b.k).putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.ids(i)); bb.putDouble(b.ds(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { b.ids(i) = bb.getLong(); b.ds(i) = bb.getDouble(); i += 1 }
    b.n = n
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByDistance =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByDistance =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByDistance =
    copy(idExpr = newChildren(0), distExpr = newChildren(1))
  override def prettyName: String = "topk_by_distance"
}

object TopK {
  /** `topK(id, distance, k)` → `array<struct<id, distance, rank>>` of the
    * group's k smallest by (distance, id). Explode to get ranked rows.
    */
  def topK(id: Column, distance: Column, k: Int): Column =
    shims.column(
      TopKByDistance(shims.expression(id), shims.expression(distance), k)
        .toAggregateExpression())
}
