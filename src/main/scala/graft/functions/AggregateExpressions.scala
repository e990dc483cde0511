package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Typed imperative aggregates with MAP-SIDE PARTIAL AGGREGATION — the
  * scale-critical property a window `row_number() <= k` lacks.
  *
  * `TopKHits` replaces the per-query-id window top-k in batch kNN
  * (reference main loop: /root/reference/acorn.py:283 runs one query at a
  * time; the batch analogue must not shuffle |corpus|×|Q| scored rows into
  * |Q| reducers). As a declarative aggregate it bounds every partial state
  * to k entries: each map task keeps a k-heap per query id, the shuffle
  * moves only |Q|·P·k rows, and the reducer merges heaps — the classic
  * two-phase (local top-k, global top-k) in one `groupBy(q_id).agg(...)`.
  *
  * `VecSum` gives element-wise float-vector summation as an aggregate, so
  * centroid builds (`Ivf.centroids`) are one narrow `groupBy(label)` whose
  * shuffle carries C×P partial d-vectors — not the posexplode'd n×d rows.
  */
final class TopKBuffer(val k: Int, val asc: Boolean) {
  // binary heap rooted at the WORST kept entry → O(log k) eviction
  val scores = new Array[Long](k)
  val ids = new Array[Long](k)
  var size = 0

  /** true iff entry (s1,id1) ranks strictly better than (s2,id2):
    * score order per `asc`, ties broken by lower id (the engine-wide
    * deterministic tie-break, Knn.ScoreDigits contract). */
  @inline def better(s1: Long, id1: Long, s2: Long, id2: Long): Boolean =
    if (s1 != s2) { if (asc) s1 < s2 else s1 > s2 } else id1 < id2

  def insert(s: Long, id: Long): Unit = {
    if (size < k) {
      var i = size
      scores(i) = s; ids(i) = id; size += 1
      // sift up: parent must be worse-or-equal than child
      while (i > 0) {
        val p = (i - 1) >> 1
        if (better(scores(p), ids(p), scores(i), ids(i))) {
          val ts = scores(p); val ti = ids(p)
          scores(p) = scores(i); ids(p) = ids(i)
          scores(i) = ts; ids(i) = ti
          i = p
        } else i = 0
      }
    } else if (better(s, id, scores(0), ids(0))) {
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var w = i // index of the worst among i and its children
        if (l < size && better(scores(w), ids(w), scores(l), ids(l))) w = l
        if (r < size && better(scores(w), ids(w), scores(r), ids(r))) w = r
        if (w == i) done = true
        else {
          val ts = scores(w); val ti = ids(w)
          scores(w) = scores(i); ids(w) = ids(i)
          scores(i) = ts; ids(i) = ti
          i = w
        }
      }
    }
  }

  /** entries best-first (the final per-group ordering). */
  def sorted: Array[(Long, Long)] = {
    val out = Array.tabulate(size)(i => (scores(i), ids(i)))
    out.sortWith { case ((s1, i1), (s2, i2)) => better(s1, i1, s2, i2) }
  }
}

/** `top_k_hits(score, id, k, asc)` → `array<struct<score:bigint,id:bigint>>`
  * of the k best (score, id) pairs, best-first, ties to the lower id. */
case class TopKHits(scoreExpr: Expression, idExpr: Expression,
                    kExpr: Expression, ascExpr: Expression,
                    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def prettyName: String = "top_k_hits"
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr, ascExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (scoreExpr.dataType != LongType || idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint score, bigint id), got " +
          s"(${scoreExpr.dataType}, ${idExpr.dataType})")
    else if (!kExpr.foldable || !ascExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: k and asc must be literals")
    else if (kVal <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be positive, got $kVal")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val kVal: Int = kExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"top_k_hits k: $other")
  }
  private lazy val ascVal: Boolean = ascExpr.eval().asInstanceOf[Boolean]

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(kVal, ascVal)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      buf.insert(s.asInstanceOf[Long], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows: Array[Any] = buf.sorted.map { case (s, id) =>
      InternalRow(s, id): Any
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuffer(kVal, ascVal)
    var i = 0
    while (i < n) { buf.insert(bb.getLong(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKHits =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKHits =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1),
      kExpr = newChildren(2), ascExpr = newChildren(3))
}

/** `vec_sum(array<float>)` → `array<double>`: element-wise sum. Partial
  * states are single d-vectors; dimension mismatch fails loudly (same
  * contract as the VectorKernel scan kernels). */
case class VecSum(child: Expression,
                  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def prettyName: String = "vec_sum"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val acc = if (buf.isEmpty) new Array[Double](n) else buf
      if (acc.length != n) throw new IllegalArgumentException(
        s"$prettyName: vector dimensions differ (${acc.length} vs $n)")
      var i = 0
      while (i < n) { acc(i) += arr.getFloat(i).toDouble; i += 1 }
      acc
    }
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other
    else {
      if (buf.length != other.length) throw new IllegalArgumentException(
        s"$prettyName: vector dimensions differ (${buf.length} vs ${other.length})")
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `vec_sum_long(array<bigint>)` → `array<bigint>`: element-wise integer
  * sum. The ORDER-INDEPENDENT centroid accumulator: float summation order
  * varies with partitioning, so a hash-compared centroid must accumulate
  * pre-quantized integer components (ADVICE r2, embedding_drift). Overflow
  * discipline: components quantized to ≤10⁴ sum safely over 2⁴⁹ rows. */
case class VecSumLong(child: Expression,
                      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def prettyName: String = "vec_sum_long"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $other")
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val acc = if (buf.isEmpty) new Array[Long](n) else buf
      if (acc.length != n) throw new IllegalArgumentException(
        s"$prettyName: vector dimensions differ (${acc.length} vs $n)")
      var i = 0
      while (i < n) { acc(i) += arr.getLong(i); i += 1 }
      acc
    }
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other
    else {
      if (buf.length != other.length) throw new IllegalArgumentException(
        s"$prettyName: vector dimensions differ (${buf.length} vs ${other.length})")
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** Column-level API for the typed aggregates. */
object aggs {
  /** k best (score, id) pairs per group, best-first. `asc=true` = lower
    * score is better (distances); `asc=false` = higher is better
    * (similarities). Shuffle carries at most k entries per (group, map task). */
  def topK(score: Column, id: Column, k: Int, asc: Boolean): Column =
    Bridge.column(TopKHits(Bridge.expression(score.cast("long")),
      Bridge.expression(id.cast("long")),
      Literal(k), Literal(asc)).toAggregateExpression())

  /** element-wise sum of an array<float> column, as array<double>. */
  def vecSum(v: Column): Column =
    Bridge.column(VecSum(Bridge.expression(v)).toAggregateExpression())

  /** element-wise integer sum of an array<bigint> column (order-exact). */
  def vecSumLong(v: Column): Column =
    Bridge.column(VecSumLong(Bridge.expression(v)).toAggregateExpression())
}
