package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Queries

/** Semantic invariants of the round-3 training-data operators — the laws
  * that must hold at ANY scale factor, checked over real testdata (the
  * oracle gate proves engine-vs-DuckDB equality; these prove the operators
  * mean what they claim). */
class TrainingOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .appName("training-ops-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def run(name: String) = Queries.byName(name).run(spark, sf)

  test("x19: ratios live in [0,1]; distinct shingles never exceed total") {
    val bad = run("x19_repetition").filter(
      col("sh_distinct") > col("sh_total") ||
        col("dup_shingle_ratio") < 0 || col("dup_shingle_ratio") > 1 ||
        col("dup_token_ratio") < 0 || col("dup_token_ratio") > 1)
    assert(bad.isEmpty, bad.collect().mkString("\n"))
  }

  test("x20: benchmark docs are excluded; shared never exceeds the doc's shingles") {
    val df = run("x20_contamination")
    assert(df.filter(col("doc_id") % 97 === 0).isEmpty, "benchmark docs leaked into the corpus side")
    assert(df.filter(col("n_shared") > col("n_shingles")).isEmpty)
    // a known near-dup of a benchmark doc would be contaminated; at minimum
    // the flag must be consistent with the ratio rule
    assert(df.filter(col("contaminated") =!= (col("contamination_ratio") >= 0.2)).isEmpty)
  }

  test("x21: packing offsets tile each stratum exactly (no gaps, no overlaps)") {
    val df = run("x21_sequence_pack").cache()
    // within a stratum, offsets ordered by doc_id are exactly cumulative
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
    val tiled = df.withColumn("expected",
        coalesce(sum(col("n_tokens")).over(w.rowsBetween(Long.MinValue, -1)), lit(0L)))
      .filter(col("start_offset") =!= col("expected"))
    assert(tiled.isEmpty, tiled.collect().take(5).mkString("\n"))
    // per-stratum token totals equal the last doc's offset + its tokens
    val spans = df.filter(col("n_seqs") < 1 || col("last_seq") < col("first_seq"))
    assert(spans.isEmpty)
    df.unpersist()
  }

  test("x23: quantized components are bounded by ±127 and the max |q| hits 127") {
    val df = run("x23_embed_quant")
    assert(df.filter(col("q_min") < -127 || col("q_max") > 127).isEmpty)
    // symmetric quantization maps the max-|v| component to exactly ±127
    assert(df.filter(col("scale") > 0 &&
      col("q_max") =!= 127 && col("q_min") =!= -127).isEmpty,
      "no component reached full scale — the scale factor is wrong")
  }

  test("x24: the salted decomposition equals the plain group-by bit-for-bit") {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val plain = graft.operators.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(round(sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType), 2).as("total"))
      .orderBy("event_type").collect().toSeq
    val salted = run("x24_salted_agg").orderBy("event_type").collect().toSeq
    assert(salted === plain)
  }

  test("x25: every document appears once per epoch, epochs in [1,3]") {
    val df = run("x25_corpus_mix")
    val perDoc = df.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), max(col("epoch")).as("max_e"), min(col("epoch")).as("min_e"))
    // n == max epoch and epochs are the contiguous 1..n
    assert(perDoc.filter(col("n") =!= col("max_e") || col("min_e") =!= 1).isEmpty)
    assert(perDoc.filter(col("max_e") < 1 || col("max_e") > 3).isEmpty)
  }

  test("qs7: streaming dedup state equals the batch x1 result") {
    val streamed = run("qs7_stream_dedup_ingest")
      .orderBy("text_hash").collect().toSeq
    val batch = run("x1_exact_dedup")
      .orderBy("text_hash").collect().toSeq
    assert(streamed === batch)
  }
}
