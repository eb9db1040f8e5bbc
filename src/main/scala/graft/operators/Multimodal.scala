package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.4 X5): image/audio/video payloads
  * travel as opaque `binary` columns next to typed metadata, and
  * decode/feature-extract runs as a partition-batched typed transform —
  * the Scala analog of a `mapInPandas` batch UDF: one iterator per
  * partition, so a real decoder could amortize model/codec setup across the
  * batch instead of paying it per row.
  *
  * This container ships no image/audio codecs, so `decode` is a STUB — a
  * deterministic fake deriving dimensions/duration from the payload bytes
  * (clearly marked below). Everything around it — the binary schema, the
  * batch shape, the partition distribution, the output schema — is real and
  * tested, which is the part that matters for the 100 TB pipeline.
  */
object Multimodal {

  /** A multimodal record: opaque payload + routing metadata. */
  case class MediaRecord(doc_id: Long, modality: String, payload: Array[Byte])

  /** Decoded features (what a real decoder would emit per item). */
  case class MediaFeatures(
      doc_id: Long,
      modality: String,
      byte_len: Long,
      width: Int,        // images/video: fake-decoded dims
      height: Int,
      duration_ms: Long, // audio/video: fake-decoded duration
      n_frames: Int,
      content_hash: Long)

  /** STUB decoder: a real implementation would parse the container format
    * (JPEG/PNG headers, WAV/MP3 frames, MP4 atoms). Deterministic fake:
    * features derive from the payload bytes alone, so results are stable
    * across partitionings and re-runs. */
  private[operators] def decodeStub(r: MediaRecord): MediaFeatures = {
    val h = graft.fingerprints.Fingerprint.fromBytes(r.payload).key
    val len = r.payload.length.toLong
    MediaFeatures(
      doc_id = r.doc_id,
      modality = r.modality,
      byte_len = len,
      width = (math.abs(h % 1024) + 16).toInt,
      height = (math.abs((h >> 10) % 768) + 16).toInt,
      duration_ms = math.abs((h >> 20) % 600000),
      n_frames = (math.abs(h >> 40) % 240 + 1).toInt,
      content_hash = h)
  }

  /** The batched decode pipeline: binary-typed Dataset in, feature-typed
    * Dataset out, decode amortized per partition (mapPartitions = the
    * batch-iterator shape; at scale, `repartition(n)` upstream sizes the
    * batches to decoder throughput). */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // a real decoder would initialize its codec/model ONCE here
      batch.map(decodeStub)
    }
  }

  /** Build a MediaRecord dataset from the documents table (text bytes stand
    * in for media payloads — the schema/plumbing is what's exercised). */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        when(col("n_chars") % 3 === 0, "image")
          .when(col("n_chars") % 3 === 1, "audio")
          .otherwise("video").as("modality"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** End-to-end: documents → media records → batched decode → features DF. */
  def features(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(fromDocuments(spark, dir)).toDF()
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
