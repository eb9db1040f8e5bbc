package graft.storage

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** A second Hadoop FileSystem SCHEME backed by local disk — the no-egress
  * stand-in for an object-store backend (the reference ships a GCS storage
  * backend, src/arti/storage/google/cloud/storage.py:36-57). The point is
  * that NOTHING in the engine assumes `file://`: discovery globs, staged
  * writes, publish renames, content hashing, and rehydrated reads all go
  * through the `Path.getFileSystem(conf)` seam, so mounting a real
  * object store is exactly this shape — one hadoop conf key naming the
  * FileSystem impl (`fs.mock.impl` here; `fs.s3a.impl`/`fs.gs.impl` in a
  * deployment). Lives in main (not test) so the continuously-timed
  * q32_mock_storage bench entry can exercise the non-file path every
  * round; MockSchemeSpec drives the full WAP/rehydrate contract over it.
  */
class MockFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mock"
  override def getUri: URI = URI.create("mock:///")
}

object MockFileSystem {
  /** Idempotent registration of the scheme on a live session's hadoop
    * conf (how a notebook user mounts a bucket after session start). */
  def register(conf: org.apache.hadoop.conf.Configuration): Unit =
    if (conf.get("fs.mock.impl") == null)
      conf.set("fs.mock.impl", classOf[MockFileSystem].getName)
}
