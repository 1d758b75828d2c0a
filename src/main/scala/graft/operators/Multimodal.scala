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
