package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch as a native distributed aggregate
  * (`TypedImperativeAggregate`): a d x w counter matrix where each input
  * increments one counter per row (`bucket(r) = md5("r|value") % w`);
  * the point-frequency estimate of a key is the MINIMUM of its d
  * counters — an overestimate with error <= 2N/w at confidence
  * 1 - 2^-d (Cormode & Muthukrishnan, J.Algorithms 2005).
  *
  * Spark ships a builtin `count_min_sketch`, but its Murmur3 hashing is
  * engine-internal — unverifiable outside the JVM. This sketch hashes
  * with md5 over `"row|value"` strings precisely so the DuckDB oracle
  * can rebuild the identical counter matrix in SQL and cross-check
  * every cell (the same md5-parity argument the MinHash/SimHash
  * operators use).
  *
  * Scale shape: updates are local per partition, partial buffers are
  * d*w longs merged pairwise by addition (associative + commutative) —
  * a constant-size map-side-combinable aggregation; the full input is
  * never shuffled.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && width >= 1, "count_min_md5 needs depth,width >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  // one digest per task thread, reset by each digest() call — update()
  // runs per input row, and a fresh getInstance there would mean depth
  // JCA lookups per row of pure overhead
  @transient private lazy val localDigest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      val md = localDigest.get()
      var r = 0
      while (r < depth) {
        buf(r * width + CountMinSketch.bucketWith(md, r, s, width)) += 1
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

object CountMinSketch {

  /** Bucket of `value` in sketch row `r` — md5("r|value"), first 8 hex
    * chars as a long, mod width. Mirrored verbatim by the oracle:
    * `('0x' || substr(md5(r || '|' || value), 1, 8))::BIGINT % width`.
    */
  def bucket(r: Int, value: String, width: Int): Int =
    bucketWith(MessageDigest.getInstance("MD5"), r, value, width)

  private[functions] def bucketWith(
      md: MessageDigest, r: Int, value: String, width: Int): Int = {
    val d = md.digest(s"$r|$value".getBytes(StandardCharsets.UTF_8))
    // first 8 hex chars == first 4 bytes, big-endian, unsigned
    val hi = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (hi % width).toInt
  }

  /** Point-frequency estimate from a materialized sketch (the driver
    * holds it — d*w longs): min of the key's counter in each row.
    */
  def estimate(sketch: Array[Long], depth: Int, width: Int,
      value: String): Long =
    (0 until depth).map(r => sketch(r * width + bucket(r, value, width))).min
}
