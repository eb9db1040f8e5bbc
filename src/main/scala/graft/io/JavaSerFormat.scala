package graft.io

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.storage.FileStorage

/** The reference's Pickle format analog (src/arti/formats/pickle.py:50-52):
  * an OPAQUE WHOLE-OBJECT serialization for artifacts that aren't tables —
  * model parameters, fitted thresholds, small lookup structures. Pickle
  * materializes the entire object in one process; this does exactly the
  * same (driver-side Java serialization of the collected rows + schema into
  * ONE file), and carries the same contract: small objects only — a
  * Collection at data scale belongs in parquet/orc, never here.
  *
  * Registered through the F23 multiple-dispatch seam ([[IO.register]]), not
  * baked into the built-in match — this format doubles as the living proof
  * that the registry accepts a NEW (format, storage) combination end to end
  * (wiring-time canWrite, executor staging writes, content fingerprints,
  * snapshot reads all go through it).
  *
  * Same trust model as pickle: deserialization executes class-resolution of
  * the stored types, so artifacts are TRUSTED engine-written bytes (the
  * reference's pickle docs carry the identical caveat). */
object JavaSerFormat {

  case object JavaSer extends Format("javaser", ".ser")

  @volatile private var done = false

  /** Idempotent registration (call from any entry point that needs it). */
  def register(): Format = synchronized {
    if (!done) {
      IO.registerFormat(JavaSer)
      IO.register(IO.Registration(
        matches = (f, s) => f == JavaSer && s.isInstanceOf[FileStorage],
        reader = Some((spark, _, _, partitions, _) => read(spark, partitions.map(_.path))),
        writer = Some((df, _, _, partition, overwrite) => write(df, partition.path, overwrite))))
      done = true
    }
    JavaSer
  }

  private def write(df: DataFrame, pathStr: String, overwrite: Boolean): Unit = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val p = new Path(pathStr)
    val fs = p.getFileSystem(conf)
    if (!overwrite) require(!fs.exists(p),
      s"refusing to overwrite $pathStr (reference forbids silent overwrite)")
    // whole-object materialization, like pickle.dumps of the value
    val rows: Array[Row] = df.collect()
    val out = new ObjectOutputStream(fs.create(p, overwrite))
    try { out.writeObject(df.schema); out.writeObject(rows) }
    finally out.close()
  }

  /** Defense-in-depth on top of the trusted-bytes contract: the stream
    * only ever NEEDS schema + row classes, so deserialization is pinned to
    * that allowlist (JDK value classes, scala runtime/collections, Spark
    * SQL types/rows) and everything else is rejected before instantiation
    * — a tampered artifact can't smuggle a gadget class through the read
    * path. `**` matches subpackages, `*` one package, `!*` rejects the
    * rest; maxdepth bounds nested-object DoS. */
  private[io] val serialFilter: java.io.ObjectInputFilter =
    java.io.ObjectInputFilter.Config.createFilter(
      "maxdepth=64;java.lang.*;java.math.*;java.time.**;java.sql.*;java.util.*;" +
        "scala.**;org.apache.spark.sql.**;org.apache.spark.unsafe.types.*;!*")

  private def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "no data: cannot read an artifact with no partitions")
    val conf = spark.sparkContext.hadoopConfiguration
    var schema: StructType = null
    val all = Seq.newBuilder[Row]
    for (pathStr <- paths) {
      val p = new Path(pathStr)
      val in = new ObjectInputStream(p.getFileSystem(conf).open(p))
      in.setObjectInputFilter(serialFilter)
      try {
        schema = in.readObject().asInstanceOf[StructType]
        all ++= in.readObject().asInstanceOf[Array[Row]]
      } finally in.close()
    }
    spark.createDataFrame(spark.sparkContext.parallelize(all.result(), 1), schema)
  }
}
