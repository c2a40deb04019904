package graft

/** Test-only Hadoop filesystem: RawLocalFileSystem re-badged under the
  * `graftfs://` scheme. Registering `fs.graftfs.impl = graft.GraftTestFs`
  * lets specs drive SnapshotStore through a genuinely non-`file://` scheme
  * offline — any `java.io.File` call left in the store fails loudly
  * ("Wrong FS"), while the Hadoop-API path works end to end. The only
  * override is [[getUri]]: `checkPath` compares a path's scheme against it,
  * so the parent's `file:///` identity would reject graftfs paths. */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}
