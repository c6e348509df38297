package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** 64-bit SimHash as ONE custom aggregate (TypedImperativeAggregate with a
  * long[64] buffer): for each input token, add +1/-1 to each bit counter
  * according to the token hash's bit; the final hash sets bit b iff
  * counter[b] > 0.
  *
  * Replaces the 64-separate-SUM formulation (64 shiftright exprs per row,
  * a 64-column aggregation buffer, and a wide exchange) with a single
  * buffer updated in one pass per token and merged bitwise-countwise —
  * partial aggregation still applies, so hot documents combine map-side.
  *
  * Hash family: the first 8 bytes (big-endian) of MD5 over the token's
  * UTF-8 bytes — chosen PRECISELY because every SQL engine ships md5(),
  * so the whole SimHash computation is oracle-expressible:
  * `CAST('0x' || substr(md5(tok), 1, 16) AS UBIGINT)` reproduces this
  * hash bit-for-bit in DuckDB (r8 VERDICT #5 — the rows-only reason for
  * q27 was the hash family, not the algorithm; the r1-r8 XXH64 form used
  * Spark-internal seeding no other engine exposes).
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = SimHashAgg.tokenHash(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      var b = 0
      while (b < 64) {
        buf(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (buf(b) > 0L) sim |= (1L << b)
      b += 1
    }
    sim
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of MD5(token bytes), big-endian — the cross-engine
    * token hash (`'0x' || substr(md5(tok), 1, 16)` parsed as a 64-bit
    * integer in any SQL engine yields the same bits).
    */
  def tokenHash(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(bytes)
    java.nio.ByteBuffer.wrap(h, 0, 8).getLong
  }
}
