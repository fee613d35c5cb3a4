package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.G — multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with a typed metadata struct, and per-partition
  * batched kernels do decode / feature-extract / resize.
  *
  * The Spark-side plumbing (schema, encoders, partition-preserving batched
  * mapPartitions, pushdown-friendly metadata predicates) is real and tested.
  * The decode kernels themselves are DETERMINISTIC STUBS — this container
  * ships no image/audio codecs — marked `// STUB:` below; swapping in a real
  * codec (JNI/ffmpeg/opencv) changes only the kernel body, not the plumbing.
  *
  * At 100 TB: payloads live in parquet binary columns (or external object
  * store keys); kernels run once per partition with batch-amortized setup
  * (model/codec init per partition, not per row) — the same batching
  * contract as PySpark's mapInPandas, expressed Scala-native.
  */
object Multimodal {

  case class MediaMeta(kind: String, width: Int, height: Int,
    sampleRate: Int, durationMs: Long)
  case class MediaItem(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
    mean_intensity: Double, histogram: Array[Long])

  /** Synthesize a deterministic media table from the documents corpus: the
    * payload is the document text bytes (stand-in for an image/audio blob —
    * deterministic and scale-proportional), metadata derived from doc fields. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaItem] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("n_chars"), col("source"))
      .map { r =>
        val id = r.getLong(0)
        val payload = r.getString(1).getBytes("UTF-8")
        val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        MediaItem(id,
          MediaMeta(kind,
            width = (r.getLong(2) % 640).toInt + 16,
            height = (r.getLong(2) % 480).toInt + 16,
            sampleRate = if (kind == "audio") 16000 else 0,
            durationMs = r.getLong(2) * 10),
          payload)
      }
  }

  /** Batched per-partition "decode + featurize": one kernel instance per
    * partition (setup amortized), rows streamed through it. */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition setup happens HERE (real codec: open decoder once)
      val histogramBins = 16
      it.map { m =>
        // STUB: a real kernel would decode m.payload with an image/audio
        // codec; this deterministic fake derives features from raw bytes so
        // the pipeline shape (binary in → features out) is fully exercised.
        val hist = new Array[Long](histogramBins)
        var sum = 0L
        var i = 0
        while (i < m.payload.length) {
          val b = m.payload(i) & 0xff
          hist(b * histogramBins / 256) += 1
          sum += b
          i += 1
        }
        MediaFeatures(m.media_id, m.meta.kind, m.payload.length,
          if (m.payload.length == 0) 0.0 else sum.toDouble / m.payload.length,
          hist)
      }
    }
  }

  /** Batched "resize": kind-aware payload transformation, partition-local. */
  def resize(items: Dataset[MediaItem], maxBytes: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        // STUB: real image resize decodes + rescales; the deterministic fake
        // truncates the payload and patches metadata consistently.
        if (m.payload.length <= maxBytes) m
        else m.copy(
          meta = m.meta.copy(
            width = math.max(1, m.meta.width / 2),
            height = math.max(1, m.meta.height / 2)),
          payload = java.util.Arrays.copyOf(m.payload, maxBytes))
      }
    }
  }

  /** Batched frame sampling: treat a video payload as fixed-size frames and
    * keep every Nth — the decode-side decimation a training pipeline runs
    * before feature extraction. Partition-local, metadata patched. */
  def frameSample(items: Dataset[MediaItem], frameBytes: Int, everyNth: Int): Dataset[MediaItem] = {
    require(frameBytes > 0 && everyNth > 0)
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        if (m.meta.kind != "video") m
        else {
          // STUB: a real kernel seeks keyframes via the container index; the
          // deterministic fake slices fixed-size byte "frames".
          val nFrames = (m.payload.length + frameBytes - 1) / frameBytes
          val kept = (0 until nFrames by everyNth).toArray
          val out = new Array[Byte](kept.length * frameBytes min m.payload.length)
          var o = 0
          kept.foreach { f =>
            val start = f * frameBytes
            val len = math.min(frameBytes, m.payload.length - start)
            if (len > 0 && o + len <= out.length) {
              System.arraycopy(m.payload, start, out, o, len)
              o += len
            }
          }
          m.copy(
            meta = m.meta.copy(durationMs = m.meta.durationMs / everyNth),
            payload = java.util.Arrays.copyOf(out, o))
        }
      }
    }
  }

  /** Metadata-level filtering happens BEFORE any kernel touches payload
    * bytes — the predicate is a plain column filter on the struct, so at
    * scale it prunes row groups without reading the (huge) binary column. */
  def selectKind(items: Dataset[MediaItem], kind: String): Dataset[MediaItem] =
    items.filter(col("meta.kind") === kind)

  /** Aggregate features per kind — the downstream analytics hop. */
  def featureStats(features: Dataset[MediaFeatures]): DataFrame =
    features.groupBy(col("kind"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        avg(col("mean_intensity")).as("avg_intensity"))
}
