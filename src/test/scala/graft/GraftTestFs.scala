package graft

/** A non-`file:` Hadoop FileSystem for tests: RawLocalFileSystem under
  * the scheme `graftfs://`. Every StreamOps path operation (existence
  * checks, leaf listing, reconciliation deletes, parquet reads/writes)
  * then resolves through FileSystem.get — the exact code path an
  * HDFS/S3 tableDir takes — instead of silently short-circuiting to
  * java.io.File semantics the way `file:` can. Registered via
  * `fs.graftfs.impl` in the test's hadoopConfiguration. */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}
