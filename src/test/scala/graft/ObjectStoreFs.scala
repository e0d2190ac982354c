package graft

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}

/** Test-only Hadoop filesystem emulating the OBJECT-STORE profile over
  * local disk, scheme `objstore://`:
  *  - `rename` is a non-atomic copy-then-delete (the S3-class shape —
  *    a crash or a concurrent reader can observe both or neither
  *    path);
  *  - `create(overwrite = false)` inherits RawLocalFileSystem's
  *    exists-then-create, which is already the non-atomic
  *    check-then-act an object store's conditional PUT emulations
  *    degrade to.
  * NonLocalFsSpec registers it via `fs.objstore.impl` to pin the
  * store/catalog filesystem contract gate (refuse-to-open without the
  * explicit single-writer acceptance) and the accepted-contract ingest
  * path end to end. The reference splits its drivers on the same
  * boundary: storage/ceph.py:53 WRITE_FULL objects vs
  * storage/file.py:57 rename-into-place.
  */
class ObjectStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "objstore"
  // constant, NOT a field: the FileSystem super constructor calls
  // getUri before subclass fields initialize
  override def getUri: URI = URI.create("objstore:///")

  override def initialize(name: URI, conf: Configuration): Unit =
    super.initialize(name, conf)

  override def rename(src: Path, dst: Path): Boolean =
    if (!exists(src)) false
    else FileUtil.copy(this, src, this, dst,
      false /* deleteSource */, true /* overwrite */, getConf) &&
      delete(src, true)

  // RawLocalFileSystem's deprecated lazy FileStatus loads permissions
  // through `new java.io.File(uri)`, which rejects non-"file" schemes;
  // object stores report fixed permissions anyway, so return EAGER
  // statuses with a constant permission set
  private def eager(st: org.apache.hadoop.fs.FileStatus) =
    new org.apache.hadoop.fs.FileStatus(st.getLen, st.isDirectory, 1,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      org.apache.hadoop.fs.permission.FsPermission.getDefault,
      "graft", "graft", st.getPath)

  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    eager(super.getFileStatus(f))

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(eager)
}
