package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Fixed-layout WIB Ethernet frame decode — the ADC-waveform data product the
  * reference's front-ends emit (cf. /root/reference/config/base/
  * iceberg_daq_eth.json stream/transport parameters;
  * /root/reference/wibs/configure_timing.sh + power_fembs.sh produce exactly
  * these streams; each dromap `src_id` names one such stream). The engine's
  * frame layout (a simplification of the DUNE WIB Ethernet format, which
  * packs 64 channels × 64 ticks of 14-bit ADC per frame):
  *
  * {{{
  *   bytes 0-3   src_id     uint32 little-endian (joins the dromap dim)
  *   bytes 4-11  timestamp  uint64 little-endian (62.5 MHz clock ticks)
  *   bytes 12-   samples    uint16 little-endian, CHANNEL-INTERLEAVED:
  *               sample j belongs to local channel j % Channels at
  *               tick j / Channels
  * }}}
  *
  * Decoding runs as ONE compiled loop per row inside whole-stage codegen —
  * no UDF/serialization boundary: at 100 TB of raw frames this is the scan
  * kernel everything downstream (pedestals, RMS, peaks, occupancy) feeds
  * from, so it must not leave the codegen'd scan stage.
  */
object WibFrame {
  /** Local channels interleaved per frame. */
  val Channels = 4
  /** Ticks per channel per frame (fixture default; decode derives the actual
    * count from the payload length). */
  val TicksPerChannel = 64
  val HeaderBytes = 12
  val FrameBytes: Int = HeaderBytes + 2 * Channels * TicksPerChannel

  val structType: StructType = StructType(Seq(
    StructField("src_id", LongType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("samples", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  /** Decode one frame; null for payloads that cannot be a frame (short
    * header or torn trailing sample byte) — malformed frames surface as
    * null structs a query can count, never as an exception that kills the
    * 100 TB scan. */
  def decode(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < HeaderBytes ||
        ((bytes.length - HeaderBytes) & 1) != 0) return null
    var srcId = 0L
    var i = 0
    while (i < 4) { srcId |= (bytes(i) & 0xffL) << (8 * i); i += 1 }
    var ts = 0L
    i = 0
    while (i < 8) { ts |= (bytes(4 + i) & 0xffL) << (8 * i); i += 1 }
    val n = (bytes.length - HeaderBytes) / 2
    val samples = new Array[Int](n)
    var j = 0
    while (j < n) {
      val off = HeaderBytes + 2 * j
      samples(j) = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
      j += 1
    }
    new GenericInternalRow(Array[Any](srcId, ts, new GenericArrayData(samples)))
  }
}

/** `wib_decode(payload)` → struct(src_id, ts, samples). */
case class WibDecodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = WibFrame.structType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"wib_decode requires BINARY input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    WibFrame.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.functions.WibFrame.decode($bytes);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WibDecodeExpr =
    copy(child = newChild)
}
