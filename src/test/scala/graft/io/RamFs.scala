package graft.io

import java.io.File
import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** A custom-scheme Hadoop FileSystem for the object-store seam spec.
  *
  * Registered via `fs.ramfs.impl` through [[Sources.configureFs]] — the
  * exact mechanism a production deployment uses for `gs://`/`s3a://`
  * connectors — so the spec proves scheme→implementation resolution,
  * credential pass-through, and a full parquet source→sink round-trip on
  * a NON-`file:` scheme without any egress. Storage delegates to local
  * disk with the logical path equal to the backing path (only the scheme
  * differs): a one-way `pathToFile` remap is NOT enough for a Hadoop FS —
  * `getFileStatus`/`listStatus` qualify result paths from the backing
  * files, so a remapped root leaks back into commit-protocol paths and
  * double-resolves (observed with the parquet FileOutputCommitter).
  * Callers therefore write under `ramfs:<RamFs.root>/...`. */
class RamFs extends RawLocalFileSystem {
  override def getScheme: String = "ramfs"
  override def getUri: URI = URI.create("ramfs:///")
}

object RamFs {
  /** Per-JVM sandbox directory the spec writes beneath. */
  lazy val root: File = {
    val f = java.nio.file.Files.createTempDirectory("graft-ramfs").toFile
    f.deleteOnExit()
    f
  }
}
