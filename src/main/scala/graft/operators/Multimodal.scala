package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.4 X5): image/audio/video payloads
  * travel as opaque `binary` columns next to typed metadata, and
  * decode/feature-extract runs as a partition-batched typed transform —
  * the Scala analog of a `mapInPandas` batch UDF: one iterator per
  * partition, so decoder setup amortizes across the batch instead of being
  * paid per row.
  *
  * The decode itself is REAL: payloads are genuine PPM images and RIFF/WAV
  * audio (plus a documented synthetic video container), parsed byte-level
  * by [[MediaCodecs]] with zero external libraries — header parsing, RIFF
  * chunk walking, per-pixel luma, per-sample RMS. A JPEG/MP4 codec would
  * slot into the same magic-byte dispatch; what this container can't ship
  * is the codec LIBRARY, not the pipeline.
  */
object Multimodal {

  /** A multimodal record: opaque payload + routing metadata. */
  case class MediaRecord(doc_id: Long, modality: String, payload: Array[Byte])

  /** Decoded features. `feature` is the modality's principal statistic:
    * mean luma (image/video keyframe) or sample RMS (audio) — emitted at
    * full precision (deterministic IEEE accumulation order), so an oracle
    * computing the same sums byte-for-byte can hash-match the raw doubles. */
  case class MediaFeatures(
      doc_id: Long,
      modality: String,
      byte_len: Long,
      width: Int,
      height: Int,
      duration_ms: Long,
      n_frames: Int,
      feature: Double,
      content_hash: Long)

  /** Magic-byte dispatch + real decode; unknown/corrupt payloads degrade
    * to an `opaque` record (len + hash only) instead of failing the batch
    * — at 100 TB a poison payload must not kill the job. */
  private[operators] def decode(r: MediaRecord): MediaFeatures = {
    val hash = graft.fingerprints.Fingerprint.fromBytes(r.payload).key
    val len = r.payload.length.toLong
    def opaque = MediaFeatures(r.doc_id, "opaque", len, 0, 0, 0L, 0, 0.0, hash)
    try {
      if (len >= 2 && r.payload(0) == 'P' && r.payload(1) == '6') {
        val img = MediaCodecs.decodePpm(r.payload)
        MediaFeatures(r.doc_id, "image", len, img.width, img.height, 0L, 1, img.meanLuma, hash)
      } else if (len >= 4 && new String(r.payload, 0, 4, "US-ASCII") == "RIFF") {
        val a = MediaCodecs.decodeWav(r.payload)
        MediaFeatures(r.doc_id, "audio", len, 0, 0, a.durationMs, 0, a.rms, hash)
      } else if (len >= 4 && new String(r.payload, 0, 4, "US-ASCII") == "GFV0") {
        val v = MediaCodecs.decodeGfv(r.payload)
        MediaFeatures(r.doc_id, "video", len, v.keyframe.width, v.keyframe.height,
          v.durationMs, v.nFrames, v.keyframe.meanLuma, hash)
      } else opaque
    } catch {
      // ANY malformed payload degrades to opaque — a truncated fmt/data
      // chunk throws IndexOutOfBounds/BufferUnderflow, not just require()
      case scala.util.control.NonFatal(_) => opaque
    }
  }

  /** The batched decode pipeline: binary-typed Dataset in, feature-typed
    * Dataset out, decode amortized per partition (mapPartitions = the
    * batch-iterator shape; at scale, `repartition(n)` upstream sizes the
    * batches to decoder throughput). */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // decoder/codec state would initialize ONCE here per batch
      batch.map(decode)
    }
  }

  /** Synthesize REAL payloads from the documents table, deterministically
    * per row (re-runs and repartitions agree): text bytes become PPM
    * rasters, PCM16 samples, or GFV0 keyframes depending on the modality
    * the row routes to. */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val bytes = if (text.isEmpty) Array[Byte]('x') else text.getBytes("UTF-8")
        def rgb(w: Int, h: Int): Array[Byte] =
          Array.tabulate(w * h * 3)(i => bytes(i % bytes.length))
        val n = nChars
        (n % 3) match {
          case 0 =>
            val w = 4 + (n % 12).toInt
            val h = 4 + ((n / 3) % 8).toInt
            MediaRecord(id, "image", MediaCodecs.encodePpm(w, h, rgb(w, h)))
          case 1 =>
            val samples = Array.tabulate((200 + n % 800).toInt)(i =>
              (((bytes(i % bytes.length) & 0xff) - 96) * 256).toShort)
            MediaRecord(id, "audio", MediaCodecs.encodeWav(8000, samples))
          case _ =>
            val frame = MediaCodecs.encodePpm(8, 6, rgb(8, 6))
            MediaRecord(id, "video", MediaCodecs.encodeGfv(1 + (n % 30).toInt, frame))
        }
      }
  }

  /** End-to-end: documents → media records → batched decode → features DF. */
  def features(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(fromDocuments(spark, dir)).toDF()

  /** Resized-image features (SURVEY X5 "resize"). */
  case class ResizedImage(
      doc_id: Long, src_w: Int, src_h: Int, out_w: Int, out_h: Int, out_luma: Double)

  /** RESIZE as a partition-batched typed transform: image payloads are
    * nearest-neighbor downsampled by `factor` through [[MediaCodecs
    * .resizePpm]] (real raster work on real bytes), and the resized frame
    * re-enters the decoder for its stats — the preprocessing shape every
    * vision-training pipeline runs (resize → re-encode → feature). Poison
    * payloads drop (same contract as decode's opaque degrade). */
  def resizeFeatures(media: Dataset[MediaRecord], factor: Int): Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.filter(_.modality == "image").flatMap { r =>
        try {
          val src = MediaCodecs.decodePpm(r.payload)
          val out = MediaCodecs.decodePpm(MediaCodecs.resizePpm(r.payload, factor))
          Some(ResizedImage(r.doc_id, src.width, src.height, out.width, out.height, out.meanLuma))
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }

  /** A perceptual image fingerprint. */
  case class ImageHash(doc_id: Long, ahash: Long)

  /** Perceptual hashing as a partition-batched typed transform: every image
    * payload reduces to its 64-bit aHash ([[MediaCodecs.ahashPpm]]) — the
    * SimHash-of-pixels that makes image dedup a banded-bucket problem
    * instead of a pairwise-pixel one. Poison payloads drop (decode's
    * opaque-degrade contract). */
  def imageHashes(media: Dataset[MediaRecord]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.filter(_.modality == "image").flatMap { r =>
        try Some(ImageHash(r.doc_id, MediaCodecs.ahashPpm(r.payload)))
        catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }

  /** Audio fingerprinting, same shape: every PCM16 clip reduces to its
    * 64-bit time-frame energy fingerprint ([[MediaCodecs.ahashWav]]). */
  def audioHashes(media: Dataset[MediaRecord]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.filter(_.modality == "audio").flatMap { r =>
        try Some(ImageHash(r.doc_id, MediaCodecs.ahashWav(r.payload)))
        catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }

  /** One sampled frame (SURVEY X5 "frame-sample"). */
  case class FrameSample(doc_id: Long, frame_idx: Int, ts_ms: Long, luma: Double)

  /** FRAME SAMPLING as a partition-batched typed transform: every
    * `stride`-th frame index of each video expands to its own row with its
    * presentation timestamp — the map-side row-expansion shape of video
    * ingest (sample → per-frame features → embed). GFV0 stores one
    * keyframe, so each sampled row carries the keyframe's luma; a real
    * MP4 codec would decode the frame AT the sampled index through this
    * same seam — the row-expansion plumbing, indices, and timestamps are
    * the load-bearing contract. */
  def frameSamples(media: Dataset[MediaRecord], stride: Int): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.filter(_.modality == "video").flatMap { r =>
        try {
          val v = MediaCodecs.decodeGfv(r.payload)
          (0 until v.nFrames by stride).iterator
            .map(i => FrameSample(r.doc_id, i, i * 40L, v.keyframe.meanLuma))
        } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      }
    }
  }

  /** Per-video scene-cut summary (x138's engine). */
  case class SceneCuts(doc_id: Long, n_frames: Int, n_cuts: Long,
      max_delta: Long, cut_frame: Int)

  /** SCENE-CUT DETECTION as a partition-batched typed transform: each
    * video's per-frame integer luma sums ([[MediaCodecs.frameLumaSums]] —
    * the deterministic stand-in for per-frame decode) yield consecutive
    * deltas; a frame is a CUT when its delta clears 2% of the video's
    * mean frame luma (the self-normalized integer rule
    * 50·n_frames·Δ ≥ Σ luma — no corpus-dependent threshold, no
    * floats; 2% splits the synthetic corpus ~70/164 videos-with-cuts at
    * sf0.01, i.e. the rule discriminates instead of firing always or
    * never). Entirely map-side: the whole summary reduces inside the
    * decode pass, zero shuffles. Videos need ≥ 2 frames; poison
    * payloads drop (the opaque-degrade contract). */
  def sceneCuts(media: Dataset[MediaRecord]): Dataset[SceneCuts] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.filter(_.modality == "video").flatMap { r =>
        try {
          val sums = MediaCodecs.frameLumaSums(r.payload)
          if (sums.length < 2) None
          else {
            val tot = sums.sum
            val nf = sums.length
            var nCuts = 0L
            var maxDelta = -1L
            var cutFrame = -1
            var f = 1
            while (f < nf) {
              val d = math.abs(sums(f) - sums(f - 1))
              if (50L * d * nf >= tot) nCuts += 1
              if (d > maxDelta) { maxDelta = d; cutFrame = f }
              f += 1
            }
            Some(SceneCuts(r.doc_id, nf, nCuts, maxDelta, cutFrame))
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }
}

/** Skew-handling utility (SURVEY "salting for skew"): explode the build side
  * by a salt factor and randomize-by-hash the probe side, so one hot key
  * spreads over `saltFactor` reducers instead of one. AQE's skew-join
  * handles sort-merge skew automatically; salting is the explicit tool for
  * hot-key aggregations and broadcast-ineligible joins. */
object Skew {
  import org.apache.spark.sql.Column

  /** Deterministic salt in [0, saltFactor) derived from stable row content
    * (not rand(): re-runs and retries must agree at 100 TB). */
  def salt(c: Column, saltFactor: Int): Column =
    pmod(xxhash64(c), lit(saltFactor))

  /** Two-phase (salted partial, then final) aggregation of `sum(valueCol)`
    * by `key`: the standard hot-key decomposition. */
  def saltedSum(df: DataFrame, key: String, valueCol: String, saltFactor: Int = 16): DataFrame =
    df.withColumn("__salt", salt(col(valueCol), saltFactor))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
}
