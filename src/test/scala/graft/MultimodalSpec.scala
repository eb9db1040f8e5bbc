package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, Skew}

/** Multimodal plumbing (X5) and skew utilities: the decode is a stub, but
  * the schema, batch shape, partition distribution, and determinism of the
  * pipeline are real — exactly what must hold for a true decoder at scale. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("multimodal-spec")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("binary payload schema survives the typed pipeline") {
    val media = Multimodal.fromDocuments(spark, sf)
    val schema = media.schema
    assert(schema("payload").dataType === org.apache.spark.sql.types.BinaryType)
    assert(media.count() === 500)
  }

  test("decode runs batched per partition and emits one feature row per record") {
    val media = Multimodal.fromDocuments(spark, sf).repartition(7)
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.count() === 500)
    assert(feats.rdd.getNumPartitions === 7, "batch shape must follow the partitioning")
    val row = feats.filter(col("doc_id") === 0).collect()(0)
    assert(row.byte_len > 0)
    assert(row.width >= 16 && row.height >= 16)
  }

  test("decode is deterministic across partitionings (content-derived)") {
    val a = Multimodal.features(spark, sf).orderBy("doc_id").collect().toSeq
    val b = Multimodal.decodeFeatures(Multimodal.fromDocuments(spark, sf).repartition(13))
      .toDF().orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("saltedSum equals plain sum (hot-key decomposition is exact)") {
    import spark.implicits._
    val df = (Seq.fill(1000)(("hot", 1.0)) ++ Seq(("cold", 2.0), ("cool", 3.0)))
      .toDF("k", "v")
    val salted = Skew.saltedSum(df, "k", "v", saltFactor = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted === Map("hot" -> 1000.0, "cold" -> 2.0, "cool" -> 3.0))
  }

  test("salt is deterministic and bounded") {
    import spark.implicits._
    val salts = (1 to 100).map(_.toString).toDF("v")
      .select(Skew.salt(col("v"), 16).as("s"))
      .collect().map(_.getLong(0))
    assert(salts.forall(s => s >= 0 && s < 16))
    val again = (1 to 100).map(_.toString).toDF("v")
      .select(Skew.salt(col("v"), 16).as("s"))
      .collect().map(_.getLong(0))
    assert(salts.toSeq === again.toSeq)
  }
}
