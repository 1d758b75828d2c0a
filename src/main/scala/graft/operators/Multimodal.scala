package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extraction runs
  * per-partition in executor-side batches (the Scala analogue of
  * `mapInPandas`), so nothing media-shaped ever crosses the driver.
  *
  * The actual codec step is STUBBED — image/audio libraries are not in
  * this container — behind [[FakeCodec]], a deterministic stand-in with
  * the same signature a real decoder would have. The Spark-side plumbing
  * (schema, batch iteration, partitioning) is real and tested.
  */
object Multimodal {

  /** Typed row for the media zone: payload + metadata struct. */
  final case class MediaRow(media_id: Long, mime: String, nbytes: Long,
                            digest: String, payload: Array[Byte])

  final case class MediaFeatures(media_id: Long, nbytes: Long,
                                 width: Int, height: Int,
                                 feature: Array[Float])

  /** Pack a text column as an opaque binary payload with typed metadata —
    * the ingest shape for any media kind. */
  def packBinary(df: DataFrame, idCol: String, textCol: String,
                 mime: String = "application/octet-stream"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mime).as("mime"),
      length(col(textCol).cast("binary")).cast("long").as("nbytes"),
      md5(col(textCol).cast("binary")).as("digest"),
      col(textCol).cast("binary").as("payload"))

  /** STUB codec: a real implementation would call an image/audio decoder
    * here (per batch, reusing the codec across rows). The fake derives
    * deterministic "dimensions" and a feature vector from payload bytes so
    * the pipeline shape — batch size, schema, partition boundary — is
    * exercised end to end. */
  object FakeCodec {
    def decode(payload: Array[Byte], dims: Int): (Int, Int, Array[Float]) = {
      val n = payload.length
      val width = 1 + (n % 64)
      val height = 1 + (n % 48)
      val feature = Array.tabulate(dims) { i =>
        if (n == 0) 0.0f
        else (java.lang.Byte.toUnsignedInt(payload(i % n)) / 255.0f)
      }
      (width, height, feature)
    }
  }

  /** One sampled frame of a media payload. `ts_ms` is the stub's fixed
    * 25fps clock (frame_idx × 40 ms). */
  final case class FrameRow(media_id: Long, frame_idx: Int, ts_ms: Long,
                            frame: Array[Byte])

  /** STUB resize: a real implementation decodes, scales to fit `maxBytes`,
    * and re-encodes; the fake truncates the payload (same 1→1 partition-
    * local shape, metadata — nbytes, digest — recomputed for the NEW bytes,
    * which is the part real pipelines get wrong). */
  def resize(media: DataFrame, maxBytes: Int): Dataset[MediaRow] = {
    implicit val rowEnc = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val out = if (r.payload.length <= maxBytes) r.payload
          else java.util.Arrays.copyOf(r.payload, maxBytes)
        md.reset()
        val digest = md.digest(out).map("%02x".format(_)).mkString
        MediaRow(r.media_id, r.mime, out.length.toLong, digest, out)
      }
    }
  }

  /** STUB frame sampling — the 1→N generator shape of video handling: the
    * payload is treated as fixed-size frames and every `everyNth` frame is
    * emitted as its own row (a real codec seeks keyframes; the slicing,
    * fan-out, and per-frame schema are what Spark sees either way). Frames
    * stay executor-side; the fan-out multiplies rows, never driver state. */
  def frameSample(media: DataFrame, frameBytes: Int,
                  everyNth: Int = 1): Dataset[FrameRow] = {
    implicit val rowEnc = Encoders.product[MediaRow]
    implicit val frameEnc = Encoders.product[FrameRow]
    media.as[MediaRow].flatMap { r =>
      val nFrames = r.payload.length / frameBytes
      (0 until nFrames by everyNth).iterator.map { i =>
        FrameRow(r.media_id, i, i * 40L,
          java.util.Arrays.copyOfRange(r.payload, i * frameBytes,
            (i + 1) * frameBytes))
      }
    }
  }

  /** Per-partition batched feature extraction over the binary column —
    * executor-side, codec instantiated once per partition (not per row),
    * mirroring the `mapInPandas` batch shape. */
  def decodeFeatures(media: DataFrame, dims: Int = 8): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    implicit val rowEnc = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition setup: a real codec handle would be created here
      rows.map { r =>
        val (w, h, f) = FakeCodec.decode(r.payload, dims)
        MediaFeatures(r.media_id, r.nbytes, w, h, f)
      }
    }
  }
}
