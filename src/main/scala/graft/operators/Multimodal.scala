package graft.operators

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2.14): image/audio/video as opaque
  * `binary` payloads with typed metadata, processed through the plumbing a
  * 100 TB training-data pipeline needs — typed `Dataset.mapPartitions`
  * batches (the Scala analogue of `mapInPandas`), deterministic
  * pseudo-features, and frame sampling.
  *
  * ** The codec itself is a STUB. ** This container has no imaging/audio
  * libraries, so [[decodeImages]] parses a deterministic fake container
  * format (`FAKE` magic | w:int32 | h:int32 | c:int8 | pixel bytes) instead
  * of JPEG/PNG. A real deployment replaces only the body of `decodeOne`
  * with an actual codec (javax.imageio, ffmpeg JNI, …); everything around
  * it — the schema, the per-partition batch iteration, the error routing,
  * the partition-sizing guidance — is the real production shape and is
  * exercised by MultimodalSpec.
  *
  * Scale notes:
  *  - Decoding is per-row CPU + transient-memory heavy. Partitions should be
  *    sized by *bytes*, not rows: set `spark.sql.files.maxPartitionBytes`
  *    (or `repartitionByRange` on asset_id) so a partition's decoded frames
  *    fit the executor. The mapPartitions form amortizes per-batch
  *    setup (codec init) across the partition — that is why it exists
  *    instead of a per-row UDF.
  *  - Payloads never shuffle: decode/feature-extract before any join, carry
  *    only the (small) features/metadata across exchanges.
  */
object Multimodal {

  case class Asset(asset_id: Long, kind: String, payload: Array[Byte])

  case class ImageMeta(asset_id: Long, width: Int, height: Int,
      channels: Int, n_bytes: Long, valid: Boolean, err: String)

  val Magic: Array[Byte] = "FAKE".getBytes("US-ASCII")
  private val HeaderLen = 4 + 4 + 4 + 1

  /** Build a fake container payload (test fixture / round-trip check). */
  def encodeFake(width: Int, height: Int, channels: Int): Array[Byte] = {
    val body = new Array[Byte](width * height * channels)
    val bb = java.nio.ByteBuffer.allocate(HeaderLen + body.length)
    bb.put(Magic).putInt(width).putInt(height).put(channels.toByte).put(body)
    bb.array()
  }

  /** STUB decode (see class doc): parse the fake header; malformed payloads
    * route to an error row instead of failing the job (the reject-table
    * pattern from SURVEY.md §2.13). */
  def decodeImages(assets: Dataset[Asset]): Dataset[ImageMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // per-partition scope: a real codec would be initialized ONCE here
      batch.map(decodeOne)
    }
  }

  private def decodeOne(a: Asset): ImageMeta = {
    val p = a.payload
    if (p == null || p.length < HeaderLen)
      ImageMeta(a.asset_id, 0, 0, 0, if (p == null) 0 else p.length, valid = false, "truncated header")
    else if (!p.take(4).sameElements(Magic))
      ImageMeta(a.asset_id, 0, 0, 0, p.length, valid = false, "bad magic")
    else {
      val bb = java.nio.ByteBuffer.wrap(p, 4, 9)
      val (w, h, c) = (bb.getInt, bb.getInt, bb.get.toInt)
      val expected = HeaderLen + w.toLong * h * c
      if (w <= 0 || h <= 0 || c <= 0 || p.length != expected)
        ImageMeta(a.asset_id, w, h, c, p.length, valid = false, "size mismatch")
      else ImageMeta(a.asset_id, w, h, c, p.length, valid = true, "")
    }
  }

  /** STUB resize (same contract as [[decodeImages]]: the pixel math is the
    * fake format's, the typed mapPartitions plumbing is real): nearest-
    * neighbor downsample of a valid container to (w/factor, h/factor),
    * re-encoded in the same container format. Invalid payloads pass
    * through unchanged (reject-routing happens at decode, not here). */
  def resize(assets: Dataset[Asset], factor: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val m = decodeOne(a)
      if (!m.valid || factor <= 1) a
      else {
        val (w2, h2) = (math.max(1, m.width / factor), math.max(1, m.height / factor))
        val out = new Array[Byte](HeaderLen + w2 * h2 * m.channels)
        val bb = java.nio.ByteBuffer.wrap(out)
        bb.put(Magic).putInt(w2).putInt(h2).put(m.channels.toByte)
        var y = 0
        while (y < h2) {
          var x = 0
          while (x < w2) {
            val src = HeaderLen +
              ((y * factor) * m.width + (x * factor)) * m.channels
            var c = 0
            while (c < m.channels) {
              bb.put(a.payload(src + c)); c += 1
            }
            x += 1
          }
          y += 1
        }
        Asset(a.asset_id, a.kind, out)
      }
    })
  }

  /** Deterministic pseudo-embedding of a binary payload: `dim` values in
    * [-0.5, 0.5) derived from xxhash64(payload, i). Stands in for a real
    * vision encoder; pure expression, so it runs at scan speed and feeds
    * the Similarity operators directly. */
  def fakeEmbedding(payload: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => pmod(xxhash64(payload, i), lit(100000L)).cast("double") / 100000.0 - 0.5)

  /** Frame sampling for video-shaped payloads: byte offsets of every
    * `everyN`-th frame of `frameBytes` after the header. Emits only offsets
    * (the pipeline reads frames lazily) — the payload itself is not copied. */
  def frameOffsets(payload: Column, frameBytes: Int, everyN: Int): Column = {
    val nFrames = floor((length(payload) - HeaderLen) / frameBytes).cast("int")
    when(nFrames > 0,
      transform(sequence(lit(0), nFrames - 1, lit(everyN)),
        f => f * frameBytes + HeaderLen))
      .otherwise(array())
  }
}
