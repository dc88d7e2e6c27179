package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A media payload: opaque bytes + declared container format. */
case class MediaBlob(doc_id: Long, media: Array[Byte], format: String)

/** Typed metadata produced by the (stubbed) decoder. */
case class MediaMeta(doc_id: Long, format: String, n_bytes: Long,
    content_md5: String, width: Int, height: Int, n_frames: Int)

/** One sampled frame: a byte-range of the payload, fingerprinted. */
case class MediaFrame(doc_id: Long, frame_idx: Int, frame_len: Int,
    frame_md5: String)

/** Fixed-width feature vector extracted from a payload. */
case class MediaFeature(doc_id: Long, feature: Array[Float])

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * `mapPartitions` over a typed `Dataset` is the JVM analogue of
  * `mapInPandas`: per-partition init (here a reused MessageDigest; in a
  * real pipeline the codec/model handle) amortized across the batch, rows
  * streamed through without materializing the partition.
  *
  * DECODE IS STUBBED: the container has no image/audio codecs, so
  * [[fakeDecode]] derives deterministic "decoded" properties (dims, frame
  * count) from the payload hash. The Spark-side contract — binary column
  * in, typed Dataset out, no driver collect, partition-parallel — is the
  * real, tested surface; swap [[fakeDecode]] for a codec call to go live.
  *
  * Scale notes: blobs never shuffle here (all ops are per-row map stages
  * fused into the scan); frame explosion multiplies rows, not bytes
  * (frames reference sliced ranges). At 100 TB keep blobs in their own
  * parquet column so pruning skips them unless touched.
  */
object Multimodal {

  /** Stage a text column as an opaque binary payload (UTF-8 bytes) with a
    * declared format — the harness stand-in for reading real media files.
    */
  def attachBlob(df: DataFrame, textCol: String = "text",
      format: String = "raw"): DataFrame =
    df.withColumn("media", encode(col(textCol), "UTF-8"))
      .withColumn("format", lit(format))

  private def hex(b: Array[Byte]): String =
    b.map("%02x".format(_)).mkString

  /** The stub decoder: deterministic pseudo-properties from the payload
    * md5 (`???`-equivalent, but benchmark-stable and oracle-checkable).
    */
  private[operators] def fakeDecode(md5hex: String, nBytes: Long): (Int, Int, Int) = {
    val width = 320 + (java.lang.Long.parseLong(md5hex.substring(0, 7), 16) % 1600).toInt
    val height = 180 + (java.lang.Long.parseLong(md5hex.substring(7, 14), 16) % 900).toInt
    val nFrames = 1 + (nBytes % 30).toInt
    (width, height, nFrames)
  }

  /** Batch "decode": binary payloads → typed [[MediaMeta]]. */
  def decodeMeta(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media"), col("format")).as[MediaBlob]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5") // per-partition init
        it.map { b =>
          md.reset()
          val h = hex(md.digest(b.media))
          val (w, ht, nf) = fakeDecode(h, b.media.length.toLong)
          MediaMeta(b.doc_id, b.format, b.media.length.toLong, h, w, ht, nf)
        }
      }
      .toDF()
  }

  /** Batch feature extraction: a normalized byte-value histogram as the
    * deterministic stand-in for an encoder's embedding (`dims` bins over
    * the 0-255 byte range, L1-normalized). The contract — binary in,
    * fixed-width float vector out, partition-batched, composable with
    * [[Similarity]] ANN over the resulting column — is the real surface;
    * swap the histogram for a model call to go live.
    */
  def extractFeatures(df: DataFrame, dims: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media"), col("format")).as[MediaBlob]
      .mapPartitions { it =>
        it.map { b =>
          val hist = new Array[Float](dims)
          var i = 0
          while (i < b.media.length) {
            hist(((b.media(i) & 0xff) * dims) >> 8) += 1f
            i += 1
          }
          val n = math.max(1, b.media.length).toFloat
          var j = 0
          while (j < dims) { hist(j) /= n; j += 1 }
          MediaFeature(b.doc_id, hist)
        }
      }
      .toDF()
  }

  /** "Resize": stride-resample the payload to at most `targetBytes`
    * bytes (every ceil(len/target)-th byte) — the byte-level stand-in
    * for image downscaling. Deterministic; output stays a [[MediaBlob]]
    * so downstream stages ([[decodeMeta]], [[extractFeatures]]) compose.
    */
  def resample(df: DataFrame, targetBytes: Int): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media"), col("format")).as[MediaBlob]
      .mapPartitions { it =>
        it.map { b =>
          val len = b.media.length
          if (len <= targetBytes) b
          else {
            val stride = (len + targetBytes - 1) / targetBytes
            val out = new Array[Byte]((len + stride - 1) / stride)
            var i = 0
            while (i < out.length) { out(i) = b.media(i * stride); i += 1 }
            MediaBlob(b.doc_id, out, b.format + s";resampled=$stride")
          }
        }
      }
      .toDF()
  }

  /** Deterministic synthetic media corpus — the fixture generator for
    * the media near-dup gates (q138/q139): per-id seeded payloads whose
    * byte distribution follows an id-specific random direction, the
    * stand-in for a corpus of visually DIVERSE images. (Text-derived
    * payloads cannot play this role: every text payload's byte histogram
    * carries the language's letter distribution, so all pairwise cosines
    * collapse to ≈ 0.99 — see [[Similarity.mediaNearDupPairs]]'s
    * centering note.) Each id draws 256 byte-weights from a cubed
    * uniform (cubing skews mass onto a few hot byte values, like a real
    * image's palette) and samples `nBytes` bytes by inverse CDF. A pure
    * function of (id, seed): reproducible across partitionings, retries,
    * and engines — the dbgen convention, distributed (one map stage,
    * no shuffle, no driver data).
    */
  def syntheticMedia(ids: DataFrame, idCol: String = "doc_id",
      nBytes: Int = 512, seed: Long = 7L): DataFrame = {
    require(nBytes >= 1, s"nBytes must be >= 1, got $nBytes")
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val rnd = new java.util.Random(id * 0x9E3779B97F4A7C15L + seed)
        val w = Array.fill(256) { val u = rnd.nextDouble(); u * u * u }
        val cdf = w.scanLeft(0.0)(_ + _).tail
        val total = cdf(255)
        val bytes = Array.fill(nBytes) {
          val x = rnd.nextDouble() * total
          var lo = 0; var hi = 255
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (cdf(mid) < x) lo = mid + 1 else hi = mid
          }
          lo.toByte
        }
        MediaBlob(id, bytes, "synthetic")
      }
    }.toDF()
  }

  /** Sample `frames` evenly-strided byte-range "frames" per payload —
    * the row-explosion shape of video frame extraction (each output row
    * carries a fingerprinted slice, not the whole blob). Payloads with
    * fewer than `frames` bytes emit one frame per byte (never
    * zero-length duplicate slices); empty payloads emit no rows.
    */
  def sampleFrames(df: DataFrame, frames: Int = 4): DataFrame = {
    require(frames >= 1, s"frames must be >= 1, got $frames")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media"), col("format")).as[MediaBlob]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.flatMap { b =>
          val eff = math.min(frames, b.media.length)
          val stride = if (eff == 0) 0 else b.media.length / eff
          (0 until eff).iterator.map { f =>
            md.reset()
            val slice = java.util.Arrays.copyOfRange(
              b.media, f * stride, f * stride + stride)
            MediaFrame(b.doc_id, f, stride, hex(md.digest(slice)))
          }
        }
      }
      .toDF()
  }
}
