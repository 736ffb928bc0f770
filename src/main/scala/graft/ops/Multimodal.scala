package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: opaque `binary` payloads + typed metadata.
  *
  * The real decode step (image/audio codecs) is STUBBED — the codec
  * libraries are not in this container — with a deterministic fake that
  * derives pseudo-dimensions from the bytes. Everything around the stub is
  * the real Spark plumbing a multimodal corpus needs at scale:
  *  - binary column + struct metadata schema,
  *  - decode hosted in mapPartitions with batch iteration (the Scala
  *    analogue of a Pandas-UDF `mapInPandas` batch loop: one decoder
  *    instance per partition, rows streamed through it),
  *  - byte-level metadata as pure column expressions where no decode is
  *    needed (length, content hash, header peek).
  */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long, width: Int, height: Int, mean_byte: Double, frames: Int)

  /** STUB DECODER — deterministic fake standing in for a real image/video
    * decode (`???` in spirit; runnable so plumbing is testable). Derives
    * pseudo width/height/frame-count from the payload bytes. */
  def stubDecode(id: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    val w = 16 + (if (n > 0) (payload(0) & 0x7f) else 0)
    val h = 16 + (if (n > 1) (payload(1) & 0x7f) else 0)
    val take = math.min(n, 64)
    val mean = if (take == 0) 0.0
      else payload.take(take).map(b => (b & 0xff).toDouble).sum / take
    MediaMeta(id, w, h, math.rint(mean * 100) / 100, 1 + n / 4096)
  }

  /** Decode stage: binary payloads → typed metadata rows, batched per
    * partition (decoder constructed once per task, not per row). */
  def decode(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "decoder" init would go here (codec contexts etc.)
        it.map { case (id, bytes) => stubDecode(id, bytes) }
      }
  }

  /** Expression-only byte metadata: no decode needed, stays in codegen. */
  def byteMeta(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
      octet_length(col("payload")).as("n_bytes"),
      sha2(col("payload"), 256).as("payload_sha"),
      ascii(substring(col("payload").cast("string"), 1, 1)).as("first_byte"))
}
