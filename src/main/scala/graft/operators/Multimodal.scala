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

  /** [[encodeFake]] with caller-supplied pixel content (`pixel(i)` is
    * truncated to a byte) — the q220 fixture needs deterministic
    * non-zero pixels so perceptual hashes carry signal. */
  def encodeFakeWith(width: Int, height: Int, channels: Int)(
      pixel: Int => Int): Array[Byte] = {
    val out = new Array[Byte](HeaderLen + width * height * channels)
    val bb = java.nio.ByteBuffer.wrap(out)
    bb.put(Magic).putInt(width).putInt(height).put(channels.toByte)
    var i = 0
    val n = width * height * channels
    while (i < n) { bb.put((pixel(i) & 0xff).toByte); i += 1 }
    out
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

  case class PHash(asset_id: Long, phash: Long, valid: Boolean)

  /** Average-hash perceptual fingerprint (the DCT-free member of the
    * pHash family, public aHash recipe): sample the image on a fixed
    * 8×8 grid (nearest-neighbor, channel 0), take the mean of the 64
    * samples, bit i = sample_i above the mean — a 64-bit fingerprint
    * that survives re-encoding, small edits and noise, which the exact
    * byte digest cannot. The mean comparison is INTEGER
    * (64·v > Σ samples — no division), so the fingerprint is bit-exact
    * across engines and a closed-form fixture's hash is
    * DuckDB-replayable (graded q220).
    *
    * Runs in the typed mapPartitions path like [[decodeImages]] (the
    * codec-adjacent step — a real deployment swaps the fake-header
    * parse for a real decode + luma plane; the grid/mean/bit logic is
    * the production shape). Invalid payloads emit valid=false rather
    * than failing the job. Downstream, the fingerprint feeds
    * [[graft.operators.NearDup.simhashCandidateEdges]] unchanged —
    * Hamming-banded blocking is hash-family-agnostic. */
  def averageHash(assets: Dataset[Asset]): Dataset[PHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val m = decodeOne(a)
      if (!m.valid) PHash(a.asset_id, 0L, valid = false)
      else {
        val samples = new Array[Int](64)
        var sum = 0
        var idx = 0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val sx = x * m.width / 8
            val sy = y * m.height / 8
            val off = HeaderLen + (sy * m.width + sx) * m.channels
            val v = a.payload(off) & 0xff
            samples(idx) = v; sum += v; idx += 1
            x += 1
          }
          y += 1
        }
        var h = 0L
        idx = 0
        while (idx < 64) {
          if (64 * samples(idx) > sum) h |= (1L << idx)
          idx += 1
        }
        PHash(a.asset_id, h, valid = true)
      }
    })
  }

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
