package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY §2.9 L7): media payloads ride
  * through the engine as opaque `binary` columns with typed metadata;
  * decode / feature-extraction runs batched per partition.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): `decodeStub` derives a deterministic fake feature vector
  * from the bytes. Everything around it — schema, batching, partition
  * parallelism, null handling — is real and unit-tested, so swapping in a
  * real decoder is a one-function change.
  *
  * Scale notes: `mapPartitions` keeps decode batched and pipelined with
  * the scan (no shuffle); feature vectors are fixed-width arrays so
  * downstream joins/aggregations are columnar-friendly. At 100 TB the
  * payload column stays pruned away unless a decode stage needs it.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           features: Array[Float])

  /** Deterministic stand-in for a real image/audio decoder: a 16-bin byte
    * histogram, L1-normalized. Replace with a codec call in production.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    if (payload != null && payload.nonEmpty) {
      payload.foreach(b => bins((b & 0xff) >> 4) += 1f)
      val total = payload.length.toFloat
      var i = 0
      while (i < 16) { bins(i) /= total; i += 1 }
    }
    bins
  }

  /** Batched featurize: binary payload column → fixed-width feature
    * vector, one pass per partition.
    */
  def featurize(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      MediaFeatures(r.media_id, r.kind,
        if (r.payload == null) 0L else r.payload.length.toLong,
        decodeStub(r.payload))
    })
  }

  case class FrameRow(media_id: Long, frame_idx: Int, n_bytes: Long,
                      features: Array[Float])

  /** Video-shaped generator op: split a payload into fixed-size frames and
    * keep every `every`-th one (frame sampling), featurizing each kept
    * frame. One input row fans out to ⌈frames/every⌉ rows — the UDTF shape
    * for media — while staying inside one mapPartitions pass (batched, no
    * shuffle; at 100 TB the fan-out multiplies rows, not bytes moved,
    * because sampling drops (every-1)/every of the payload immediately).
    * The per-frame decode is the same labeled stub as `decodeStub`.
    */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int,
      every: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    require(frameBytes > 0 && every > 0)
    media.mapPartitions(_.flatMap { r =>
      val payload = if (r.payload == null) Array.emptyByteArray else r.payload
      val nFrames = (payload.length + frameBytes - 1) / frameBytes
      (0 until nFrames).iterator.filter(_ % every == 0).map { i =>
        val frame = payload.slice(i * frameBytes,
          math.min((i + 1) * frameBytes, payload.length))
        FrameRow(r.media_id, i, frame.length.toLong, decodeStub(frame))
      }
    })
  }

  /** Image-resize metadata op (stub codec): "decode" deterministic fake
    * (width, height) from the payload header bytes, then compute the
    * aspect-preserving thumbnail dims for a max edge — the metadata
    * calculation is real, the dimension extraction is the labeled stub.
    */
  def thumbnailDims(media: Dataset[MediaRow], maxEdge: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val p = if (r.payload == null || r.payload.length < 2)
        Array[Byte](1, 1) else r.payload
      // stub: fake dims derived from the first bytes (stand-in for a real
      // header parse); strictly positive
      val w = 64 + (p(0) & 0xff) * 8
      val h = 64 + (p(1) & 0xff) * 8
      val scale = math.min(1.0, maxEdge.toDouble / math.max(w, h))
      (r.media_id, r.kind, w, h,
        math.max(1, math.round(w * scale).toInt),
        math.max(1, math.round(h * scale).toInt))
    }).toDF("media_id", "kind", "width", "height", "thumb_w", "thumb_h")
  }

  /** Demo pipeline over `documents`: treat utf-8 text bytes as an opaque
    * payload (exactly how a real image column would flow).
    */
  def documentPayloadFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("media_id"), lit("text").as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
    featurize(media).toDF()
  }
}
