package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (§2.H): codegen'd scalar kernels that stay
  * inside whole-stage codegen — no UDF/serialization boundary in the hot
  * path at 100 TB.
  */

/** Adler-32 checksum of a binary payload — the integrity digest the
  * reference computes per data file before dropbox transfer
  * (cf. /root/reference/file_transfer_scripts/insert_extra_fields.py:24-31,
  * zlib.adler32 over 16 KiB blocks). Returns the checksum as a long
  * (unsigned 32-bit range).
  */
case class Adler32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"adler32 requires BINARY input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val a = new java.util.zip.Adler32()
    a.update(input.asInstanceOf[Array[Byte]])
    a.getValue
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val adler = ctx.freshName("adler")
      s"""
         |java.util.zip.Adler32 $adler = new java.util.zip.Adler32();
         |$adler.update($bytes);
         |${ev.value} = $adler.getValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Adler32 =
    copy(child = newChild)
}

/** 64-bit rolling-hash document fingerprint: the minimum of all k-gram
  * polynomial rolling hashes of the string's bytes (winnowing-style
  * min-sampling, k=8). Equal texts get equal fingerprints; a single edited
  * byte usually leaves the minimum untouched, so near-identical documents
  * tend to share fingerprints — the shard-level pre-filter for dedup.
  */
object RollingFingerprint {
  final val K = 8
  final val Base = 1000003L

  def fingerprint(bytes: Array[Byte]): Long = {
    if (bytes.length < K) {
      // short input: single polynomial hash of the whole payload
      var h = 0L
      var i = 0
      while (i < bytes.length) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
      return h
    }
    // precompute Base^(K-1) for the roll-off term
    var pow = 1L
    var j = 1
    while (j < K) { pow *= Base; j += 1 }
    var h = 0L
    var i = 0
    while (i < K) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    var min = h
    while (i < bytes.length) {
      h = (h - (bytes(i - K) & 0xffL) * pow) * Base + (bytes(i) & 0xffL)
      if (h < min) min = h
      i += 1
    }
    min
  }
}

/** 64-bit SimHash of a whitespace-tokenized text: bit k of the result is
  * the sign of Σ over distinct tokens of ±1 according to bit k of
  * xxHash64(token). Computing it as a scalar expression makes the whole
  * dedup signature stage a narrow map — no explode, no 64-column
  * aggregate, no shuffle.
  */
object Simhash {
  def compute(text: UTF8String): Long = {
    val toks = text.toString.trim.split(" +")
    val seen = new java.util.HashSet[String]()
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (seen.add(t)) {
        val u = UTF8String.fromString(t)
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
        var k = 0
        while (k < 64) {
          if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
          k += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 64) { if (counts(k) > 0) fp |= (1L << k); k += 1 }
    fp
  }
}

case class Simhash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    Simhash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.Simhash.compute($str);")

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

/** K MinHash signature values of a whitespace-tokenized text in ONE pass
  * over the tokens: sig[i] = min over distinct tokens of xxHash64(token,
  * seed=i). The column-expression formulation (K × array_min ∘ transform)
  * walks the token array K times and allocates K intermediate arrays; this
  * kernel walks it once.
  */
object MinhashSig {
  def compute(text: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = text.toString.trim.split(" +")
    val seen = new java.util.HashSet[String]()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (seen.add(t)) {
        val u = UTF8String.fromString(t)
        var s = 0
        while (s < k) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, s.toLong)
          if (h < sig(s)) sig(s) = h
          s += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }
}

case class MinhashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    MinhashSig.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.MinhashSig.compute($str, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

/** All L random-hyperplane LSH table signatures of a vector in ONE pass:
  * out[t] = Σ_b [dot(vec, plane_{t·bits+b}) ≥ 0] · 2^b. The column-expression
  * formulation (L×bits independent `aggregate(zip_with(...))` dots) runs as
  * interpreted higher-order functions — ~64 lambda-fold evaluations per row
  * dominated the embedding LSH stage (3.7 s of a 7 s query at sf0.1); this
  * kernel is one compiled loop nest per row. Bit semantics and float
  * operation order match the column formulation exactly (sequential
  * left-to-right dot), so signatures are bit-identical to it.
  */
object HyperplaneSig {
  def compute(vec: org.apache.spark.sql.catalyst.util.ArrayData,
              planes: Array[Double], tables: Int, bits: Int,
              dim: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val v = vec.toDoubleArray()
    val n = math.min(dim, v.length)
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var sig = 0
      var b = 0
      while (b < bits) {
        val off = (t * bits + b) * dim
        var dot = 0.0
        var i = 0
        while (i < n) { dot += v(i) * planes(off + i); i += 1 }
        if (dot >= 0) sig |= (1 << b)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class HyperplaneSigExpr(child: Expression, planes: Array[Double],
                             tables: Int, bits: Int, dim: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sig requires ARRAY<DOUBLE> input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    HyperplaneSig.compute(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      planes, tables, bits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, vec =>
      s"${ev.value} = graft.functions.HyperplaneSig.compute($vec, $planesRef, $tables, $bits, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigExpr =
    copy(child = newChild)
}

case class RollingFingerprintExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    RollingFingerprint.fingerprint(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.RollingFingerprint.fingerprint($str.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprintExpr =
    copy(child = newChild)
}

/** Strict sequential dot product of two ARRAY<DOUBLE> columns — one
  * compiled loop per row. Semantics match the higher-order-function
  * formulation `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` on ALL
  * inputs, edge cases included: float operation order is the same left
  * fold of elementwise products (bit-identical sums), a null element
  * yields NULL (a null product poisons the HOF fold), and length-mismatched
  * arrays yield NULL (zip_with pads the short side with nulls). Swapping
  * formulations can therefore never move an oracle hash. The HOF form
  * allocates an intermediate products array and walks generic ArrayData
  * per element; this kernel is the hot-path replacement for the ANN
  * scoring and embedding near-dup verify stages.
  */
object DotProduct {
  /** Boxed so the expression can return NULL exactly where the HOF does. */
  def compute(a: org.apache.spark.sql.catalyst.util.ArrayData,
              b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var d = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      d += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    d
  }
}

case class DotProductExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (dt: DataType) => dt match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dotp requires two ARRAY<DOUBLE> inputs, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotp")
      s"""
         |java.lang.Double $tmp = graft.functions.DotProduct.compute($a, $b);
         |${ev.isNull} = $tmp == null;
         |${ev.value} = ${ev.isNull} ? -1.0 : $tmp.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object ZOrder {
  /** Spread the low 32 bits of `x` into the even bit positions of a long
    * (magic-number bit doubling — O(log n) shifts, branch-free). */
  def spread(x0: Long): Long = {
    var x = x0 & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Z-curve (Morton) interleave of two 32-bit values: bit i of `a` lands
    * at position 2i, bit i of `b` at 2i+1. Monotone per dimension, so
    * range-partitioning on the z-value clusters BOTH dimensions at once —
    * the multi-dimensional clustering behind OPTIMIZE ZORDER. */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

/** `zorder64(a, b)` — Morton interleave of two (already 0..2³²-1
  * normalized) longs; the compaction clustering key for two-column data
  * skipping. Codegen'd: stays inside whole-stage codegen in the rewrite
  * projection. */
case class ZOrder64Expr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"zorder64 requires two BIGINT inputs, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrder.interleave($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZOrder64Expr =
    copy(left = newLeft, right = newRight)
}

/** `minhash_agg(sig)` — GROUP-LEVEL MinHash: the elementwise MIN of the
  * rows' signature arrays, which by the MinHash property IS the signature
  * of the UNION of the rows' token sets (min commutes with set union). A
  * `TypedImperativeAggregate`, so Catalyst runs it with MAP-SIDE PARTIAL
  * aggregation (ObjectHashAggregate): each task folds its rows into one
  * k-long buffer and only k·8-byte buffers shuffle — group signatures over
  * a 100 TB corpus move kilobytes per group, never token sets. Composes
  * with `minhash_sig`: `minhash_agg(minhash_sig(text, k))` is the sketch
  * of everything a group says. Buffer empty = no non-null input = null
  * result (like built-in aggregates); mismatched lengths fold over the
  * first-seen length. */
case class MinhashAggExpr(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray()
      if (buf.isEmpty) arr // toLongArray returns a fresh array — safe to own
      else {
        var i = 0
        val n = math.min(buf.length, arr.length)
        while (i < n) { if (arr(i) < buf(i)) buf(i) = arr(i); i += 1 }
        buf
      }
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      var i = 0
      val n = math.min(b1.length, b2.length)
      while (i < n) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
      b1
    }

  override def eval(buf: Array[Long]): Any =
    if (buf.isEmpty) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_agg requires ARRAY<BIGINT> input, got ${t.catalogString}")
    }
  override def prettyName: String = "minhash_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinhashAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinhashAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinhashAggExpr =
    copy(child = newChild)
}

/** Per-file BLOOM FILTER support for manifest data skipping (the Iceberg
  * puffin-blob / parquet-bloom analog, lifted to the table manifest):
  * min/max bounds prune RANGE-clustered columns, but a high-cardinality
  * column whose values are scattered across files (hash-distributed ids,
  * names) has full-range bounds everywhere and never skips — a per-file
  * bloom prunes exactly those point lookups. Values are canonicalized to
  * their string form at build AND probe (type-agnostic, cast-stable for
  * integral types), hashed with xxHash64 under `NumHashes` seeds. */
object Blooms {
  /** Fixed hash count — build and probe must agree; 4 keeps the false-
    * positive rate at (fill)^4 with one probe word per hash. */
  val NumHashes = 4
  /** Default filter width: 64 Ki bits = 8 KiB per (file, column) — at
    * ~100k rows/file the fill stays ≤ ~10% → fpp ≈ 1e-4. Manifest cost,
    * not data cost. */
  val DefaultBits = 65536

  def setBit(bits: Array[Byte], h: Long): Unit = {
    val idx = java.lang.Math.floorMod(h, bits.length.toLong * 8).toInt
    bits(idx >>> 3) = (bits(idx >>> 3) | (1 << (idx & 7))).toByte
  }

  def getBit(bits: Array[Byte], h: Long): Boolean = {
    val idx = java.lang.Math.floorMod(h, bits.length.toLong * 8).toInt
    (bits(idx >>> 3) & (1 << (idx & 7))) != 0
  }

  def hash(s: UTF8String, seed: Int): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed.toLong)

  def add(bits: Array[Byte], s: UTF8String): Unit = {
    var i = 0
    while (i < NumHashes) { setBit(bits, hash(s, i)); i += 1 }
  }

  /** Probe — false only when the value is PROVABLY absent from the file. */
  def mayContain(bits: Array[Byte], s: UTF8String): Boolean = {
    var i = 0
    while (i < NumHashes) { if (!getBit(bits, hash(s, i))) return false; i += 1 }
    true
  }
}

/** `bloom_agg(cast(c AS STRING))` — a file's bloom filter as a
  * `TypedImperativeAggregate`: update sets `NumHashes` bits per value,
  * merge ORs the bitmaps, so the per-file group-by runs with map-side
  * partial aggregation and only `bits/8`-byte buffers shuffle. Nulls add
  * nothing (null membership is the stats map's null-count job). */
case class BloomAggExpr(child: Expression, numBits: Int = Blooms.DefaultBits,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Byte]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](numBits / 8)

  override def update(buf: Array[Byte],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Blooms.add(buf, v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b1.length) { b1(i) = (b1(i) | b2(i)).toByte; i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires STRING input (canonical form), got ${child.dataType.catalogString}")
  override def prettyName: String = "bloom_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAggExpr =
    copy(child = newChild)
}
