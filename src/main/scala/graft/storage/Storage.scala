package graft.storage

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import java.security.MessageDigest

import graft.fingerprints.Fingerprint
import graft.partitions.PartitionKey.PartitionKey

/** One discovered/generated partition of an artifact's storage
  * (reference: src/arti/storage/__init__.py:24-59). `inputFingerprint` is
  * the producer-side id that built it (identity for raw data);
  * `contentFingerprint` is filled by `snapshot()`-time hashing. */
final case class StoragePartition(
    path: String,
    key: PartitionKey,
    inputFingerprint: Fingerprint = Fingerprint.identity,
    contentFingerprint: Option[Fingerprint] = None)

/** Storage backends resolve partitions. Hadoop's FileSystem API is the
  * unifying layer (file://, hdfs://, s3a://, gs:// all behave alike), which
  * is how one implementation covers the reference's LocalFile + GCS pair
  * (reference: src/arti/storage/local.py:30-63,
  * src/arti/storage/google/cloud/storage.py:36-57). */
sealed trait Storage {
  /** List existing partitions (raw-data discovery, reference F20/F21). */
  def discoverPartitions(conf: Configuration): Seq[StoragePartition]
  /** Render the concrete partition path for a key + input fingerprint
    * (reference F27, storage/__init__.py:179-222). */
  def generatePartition(key: PartitionKey, inputFingerprint: Fingerprint): StoragePartition
  /** Hash partition content for snapshotting (reference F22: sha256 of the
    * bytes → farmhash of the hex digest, storage/local.py:22-27). */
  def contentFingerprint(p: StoragePartition, conf: Configuration): Fingerprint
}

/** File-based storage with an arbitrary path template. Works for both the
  * engine-native Hive layout (`k=v` directories, Catalyst prunes natively)
  * and reference-style templates like `{date.iso}.json`. */
final case class FileStorage(template: PathTemplate) extends Storage {

  def discoverPartitions(conf: Configuration): Seq[StoragePartition] = {
    val glob = new Path(template.wildcard)
    val fs = glob.getFileSystem(conf)
    val statuses = Option(fs.globStatus(glob)).getOrElse(Array.empty)
    // templates may carry a scheme (s3a://bucket/...); match the full URI
    // string first, then the scheme-less path (local templates like /data/…)
    statuses.toSeq.flatMap { st =>
      val candidates = Seq(st.getPath.toString, st.getPath.toUri.getPath).distinct
      candidates.iterator.flatMap { p =>
        template.parse(p).map { case (key, fp) =>
          StoragePartition(p, key, fp.getOrElse(Fingerprint.identity))
        }
      }.nextOption()
    }
  }

  def generatePartition(key: PartitionKey, inputFingerprint: Fingerprint): StoragePartition = {
    val extras =
      if (template.placeholders.exists(_._1 == "input_fingerprint"))
        Map("input_fingerprint" -> inputFingerprint.key.toString)
      else Map.empty[String, String]
    StoragePartition(template.render(key, extras), key, inputFingerprint)
  }

  def contentFingerprint(p: StoragePartition, conf: Configuration): Fingerprint = {
    val path = new Path(p.path)
    val fs = path.getFileSystem(conf)
    val md = MessageDigest.getInstance("SHA-256")
    def hashFile(f: Path): Unit = {
      val in = fs.open(f)
      try {
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
      } finally in.close()
    }
    val st = fs.getFileStatus(path)
    if (st.isDirectory) {
      // deterministic order over part-files
      val files = fs.listStatus(path).filter(_.isFile).map(_.getPath)
        .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
        .sortBy(_.getName)
      files.foreach(hashFile)
    } else hashFile(path)
    Fingerprint.fromString(md.digest().map("%02x".format(_)).mkString)
  }
}

/** Inline literal storage (reference: src/arti/storage/literal.py:224-251):
  * a single unpartitioned value carried in the model itself. */
final case class LiteralStorage(json: String) extends Storage {
  def discoverPartitions(conf: Configuration): Seq[StoragePartition] =
    Seq(StoragePartition(s"literal://${Fingerprint.fromString(json).hex}", Map.empty))
  def generatePartition(key: PartitionKey, inputFingerprint: Fingerprint): StoragePartition =
    StoragePartition(s"literal://${Fingerprint.fromString(json).hex}", key, inputFingerprint)
  def contentFingerprint(p: StoragePartition, conf: Configuration): Fingerprint =
    Fingerprint.fromString(json)
}
