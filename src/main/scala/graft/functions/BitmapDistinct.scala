package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact COUNT(DISTINCT) over integral keys as a mergeable bitmap — the
  * distributed answer to the dedup-shuffle plan Spark builds for
  * distinct aggregates.
  *
  * Stock plan: partial-deduplicate (group, key) rows map-side, SHUFFLE
  * THE SURVIVORS (tens of millions of rows for a fact-table key), dedup
  * again, count — probes/full_eval.json measured h04 at 5.1 s of mostly
  * exchange. With a bitmap aggregate the partial state per (task, group)
  * is a compressed key-set, the exchange carries kilobytes-to-megabytes
  * instead of row floods, and the final merge is bitwise OR: the same
  * single-pass no-Expand shape any non-distinct aggregate gets, at any
  * number of groups, with exact results.
  *
  * The set is roaring-shaped ("roaring-lite"): values split into 16-bit
  * pages; a page starts as a sorted char array (2 B/value, memory-safe
  * for arbitrarily scattered keys) and upgrades to a fixed 8 KB bit
  * container at 4096 entries (dense ids — the common fact-key case).
  * Update cost is a binary search hit for duplicate keys, which dominate
  * a fact scan. Worst-case memory is ~2.5 B per DISTINCT value per
  * (task, group) — bounded by data cardinality, never by key range.
  */
object BitmapDistinct {

  /** Upgrade threshold: past this an array page costs more than the 8 KB
    * bit container it becomes (4096 × 2 B). */
  private val ArrayMax = 4096

  final class PageSet extends Serializable {
    // sorted page directory (page inserts are rare — search is hot)
    private[BitmapDistinct] var pageKeys = new Array[Long](8)
    private[BitmapDistinct] var pages = new Array[AnyRef](8) // Array[Char] | Array[Long]
    private[BitmapDistinct] var nPages = 0
    private var lastIdx = -1 // run locality: fact keys arrive clustered

    def add(value: Long): Unit = {
      val pk = value >> 16
      val low = (value & 0xffff).toInt
      val idx = findPage(pk)
      if (idx < 0) insertPage(-idx - 1, pk, low)
      else addToPage(idx, low)
    }

    private def findPage(pk: Long): Int = {
      if (lastIdx >= 0 && lastIdx < nPages && pageKeys(lastIdx) == pk)
        return lastIdx
      var lo = 0; var hi = nPages - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val k = pageKeys(mid)
        if (k < pk) lo = mid + 1
        else if (k > pk) hi = mid - 1
        else { lastIdx = mid; return mid }
      }
      -(lo + 1)
    }

    private def insertRawPage(at: Int, pk: Long, page: AnyRef): Unit = {
      if (nPages == pageKeys.length) {
        pageKeys = java.util.Arrays.copyOf(pageKeys, nPages * 2)
        pages = java.util.Arrays.copyOf(pages, nPages * 2)
      }
      System.arraycopy(pageKeys, at, pageKeys, at + 1, nPages - at)
      System.arraycopy(pages, at, pages, at + 1, nPages - at)
      pageKeys(at) = pk
      pages(at) = page
      nPages += 1
      lastIdx = at
    }

    private def insertPage(at: Int, pk: Long, low: Int): Unit = {
      val arr = new Array[Char](4)
      arr(0) = low.toChar
      insertRawPage(at, pk, new ArrPage(arr, 1))
    }

    private def addToPage(idx: Int, low: Int): Unit = pages(idx) match {
      case bits: Array[Long] =>
        bits(low >>> 6) |= (1L << low)
      case ap: ArrPage =>
        val n = ap.n; val a = ap.a
        // binary search (duplicates dominate fact scans — hit = no move)
        var lo = 0; var hi = n - 1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          val v = a(mid).toInt
          if (v < low) lo = mid + 1
          else if (v > low) hi = mid - 1
          else return
        }
        if (n == ArrayMax) {
          // upgrade to bit container
          val bits = new Array[Long](1024)
          var i = 0
          while (i < n) { val v = a(i).toInt; bits(v >>> 6) |= (1L << v); i += 1 }
          bits(low >>> 6) |= (1L << low)
          pages(idx) = bits
        } else {
          val na = if (n == a.length) java.util.Arrays.copyOf(a, n * 2) else a
          System.arraycopy(na, lo, na, lo + 1, n - lo)
          na(lo) = low.toChar
          ap.a = na; ap.n = n + 1
        }
    }

    def or(other: PageSet): Unit = {
      var i = 0
      while (i < other.nPages) {
        val pk = other.pageKeys(i)
        other.pages(i) match {
          case bits: Array[Long] =>
            val idx = findPage(pk)
            if (idx < 0) {
              insertRawPage(-idx - 1, pk, java.util.Arrays.copyOf(bits, 1024))
            } else pages(idx) match {
              case mine: Array[Long] =>
                var w = 0
                while (w < 1024) { mine(w) |= bits(w); w += 1 }
              case ap: ArrPage =>
                val merged = java.util.Arrays.copyOf(bits, 1024)
                var j = 0
                while (j < ap.n) {
                  val v = ap.a(j).toInt; merged(v >>> 6) |= (1L << v); j += 1
                }
                pages(idx) = merged
            }
          case ap: ArrPage =>
            var j = 0
            while (j < ap.n) { add((pk << 16) | ap.a(j).toLong); j += 1 }
        }
        i += 1
      }
    }

    def cardinality: Long = {
      var total = 0L; var i = 0
      while (i < nPages) {
        pages(i) match {
          case bits: Array[Long] =>
            var w = 0
            while (w < 1024) { total += java.lang.Long.bitCount(bits(w)); w += 1 }
          case ap: ArrPage => total += ap.n
        }
        i += 1
      }
      total
    }

    def serialize(): Array[Byte] = {
      // exact size, then bulk ByteBuffer puts — DataOutputStream's
      // byte-at-a-time writeLong was the dominant cost of shipping the
      // partials (72 MB of mostly bit containers on the h04 shape)
      var size = 4
      var i = 0
      while (i < nPages) {
        size += 8 + 1 + (pages(i) match {
          case _: Array[Long] => 8192
          case ap: ArrPage => 4 + ap.n * 2
        })
        i += 1
      }
      val buf = java.nio.ByteBuffer.allocate(size)
      buf.putInt(nPages)
      i = 0
      while (i < nPages) {
        buf.putLong(pageKeys(i))
        pages(i) match {
          case bits: Array[Long] =>
            buf.put(1: Byte)
            buf.asLongBuffer().put(bits)
            buf.position(buf.position() + 8192)
          case ap: ArrPage =>
            buf.put(0: Byte)
            buf.putInt(ap.n)
            val cb = buf.asCharBuffer()
            cb.put(ap.a, 0, ap.n)
            buf.position(buf.position() + ap.n * 2)
        }
        i += 1
      }
      buf.array()
    }
  }

  private[functions] final class ArrPage(var a: Array[Char], var n: Int)
    extends Serializable

  def deserialize(bytes: Array[Byte]): PageSet = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val s = new PageSet
    val n = buf.getInt()
    s.pageKeys = new Array[Long](math.max(n, 8))
    s.pages = new Array[AnyRef](math.max(n, 8))
    s.nPages = n
    var i = 0
    while (i < n) {
      s.pageKeys(i) = buf.getLong()
      if (buf.get() == 1) {
        val bits = new Array[Long](1024)
        buf.asLongBuffer().get(bits)
        buf.position(buf.position() + 8192)
        s.pages(i) = bits
      } else {
        val cnt = buf.getInt()
        val a = new Array[Char](math.max(cnt, 4))
        buf.asCharBuffer().get(a, 0, cnt)
        buf.position(buf.position() + cnt * 2)
        s.pages(i) = new ArrPage(a, cnt)
      }
      i += 1
    }
    s
  }
}

/** `COUNT(DISTINCT child)` for integral `child`, as a [[BitmapDistinct.PageSet]]
  * aggregate. Exact; NULLs ignored per COUNT semantics. Planned by
  * [[graft.plans.DistinctToBitmap]]. */
final case class BitmapDistinctCount(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapDistinct.PageSet]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): BitmapDistinct.PageSet =
    new BitmapDistinct.PageSet

  private lazy val toLong: Any => Long = child.dataType match {
    case LongType | TimestampType | TimestampNTZType =>
      v => v.asInstanceOf[Long]
    case IntegerType | DateType => v => v.asInstanceOf[Int].toLong
    case ShortType => v => v.asInstanceOf[Short].toLong
    case ByteType => v => v.asInstanceOf[Byte].toLong
    case other => throw new IllegalStateException(
      s"BitmapDistinctCount over non-integral type $other")
  }

  override def update(buffer: BitmapDistinct.PageSet,
      input: InternalRow): BitmapDistinct.PageSet = {
    val v = child.eval(input)
    if (v != null) buffer.add(toLong(v))
    buffer
  }

  override def merge(buffer: BitmapDistinct.PageSet,
      other: BitmapDistinct.PageSet): BitmapDistinct.PageSet = {
    buffer.or(other)
    buffer
  }

  override def eval(buffer: BitmapDistinct.PageSet): Any = buffer.cardinality

  override def serialize(buffer: BitmapDistinct.PageSet): Array[Byte] =
    buffer.serialize()

  override def deserialize(bytes: Array[Byte]): BitmapDistinct.PageSet =
    BitmapDistinct.deserialize(bytes)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_distinct_count"

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinctCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinctCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapDistinctCount =
    copy(child = newChild)
}
