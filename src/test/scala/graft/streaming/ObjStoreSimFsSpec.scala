package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Semantics of the simulated object store itself — the spec that makes
  * the committer tests meaningful: if the simulation were secretly
  * POSIX-atomic everywhere, a green committer drill would prove nothing.
  * Asserted here: PUT is all-or-nothing and visible only at close,
  * conditional create has exactly-one-winner semantics at close time, and
  * rename is a non-atomic copy+delete batch that an injected crash leaves
  * HALF-DONE (partial destination, intact source) — the torn state real
  * object stores produce and the rename committer cannot tolerate. */
class ObjStoreSimFsSpec extends AnyFunSuite {

  private def fs = {
    val conf = new Configuration()
    conf.set(ObjStoreSimFs.ImplConfKey, ObjStoreSimFs.ImplClass)
    new Path("objsim:///").getFileSystem(conf)
  }

  private def tmpRoot(): String =
    "objsim://" + Files.createTempDirectory("objsim").toString

  private def put(p: Path, s: String, overwrite: Boolean = true): Unit = {
    val out = fs.create(p, overwrite)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private def get(p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in).mkString finally in.close()
  }

  test("PUT is atomic: invisible before close, complete after") {
    val root = tmpRoot()
    val p = new Path(root, "obj1")
    val out = fs.create(p, true)
    out.write("hello-object-store".getBytes("UTF-8"))
    out.flush()
    assert(!fs.exists(p), "a half-written object must not be visible")
    out.close()
    assert(fs.exists(p))
    assert(get(p) == "hello-object-store")
  }

  test("conditional create: exactly one of two racing writers wins at close") {
    val root = tmpRoot()
    val p = new Path(root, "commit-object")
    // both writers pass the pre-check (object absent), as in a real race
    val a = fs.create(p, false)
    val b = fs.create(p, false)
    b.write("writer-b".getBytes("UTF-8")); b.close() // B lands first
    a.write("writer-a".getBytes("UTF-8"))
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException](a.close())
    assert(get(p) == "writer-b", "the winner's object must be untouched")
    // and a later create-exclusive fails at the pre-check already
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException](fs.create(p, false))
  }

  test("rename is copy+delete: an injected crash leaves a partial destination " +
      "and an intact source (the non-atomicity the committer must survive)") {
    val root = tmpRoot()
    val src = new Path(root, "srcdir")
    (0 until 3).foreach(i => put(new Path(src, s"f$i"), s"content-$i"))
    val dst = new Path(root, "dstdir")
    ObjStoreSimFs.armRenameFailure(afterObjects = 1)
    try intercept[java.io.IOException](fs.rename(src, dst))
    finally ObjStoreSimFs.disarmRenameFailure()
    assert(fs.exists(src) && fs.listStatus(src).length == 3,
      "source must be intact (delete phase never ran)")
    assert(fs.exists(dst) && fs.listStatus(dst).length == 1,
      "destination must be PARTIAL — this is the torn state")
    // recovery-free retry is NOT possible onto the partial dst (no replace)
    assert(!fs.rename(src, dst))
    // clean rename (no injection) moves everything and deletes the source
    val dst2 = new Path(root, "dstdir2")
    assert(fs.rename(src, dst2))
    assert(!fs.exists(src))
    assert(fs.listStatus(dst2).length == 3)
    assert(get(new Path(dst2, "f1")) == "content-1")
  }

  test("rename refuses an existing destination (no replace, no move-into)") {
    val root = tmpRoot()
    put(new Path(root, "a"), "x")
    put(new Path(root, "b"), "y")
    assert(!fs.rename(new Path(root, "a"), new Path(root, "b")))
    assert(get(new Path(root, "b")) == "y")
  }
}
