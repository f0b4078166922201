package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Min-progress + storage semantics
  * (/root/reference/ckp/manager_test.go:29-51 + storage_file_test.go:31-58). */
class CkpManagerSpec extends AnyFunSuite {

  test("min progress across sinks is the minimum") {
    val m = new CkpManager(new MemoryCkpStorage)
    m.update("kafka", Checkpoint(Progress("mysql-bin.000002", 1000, 7)))
    m.update("stdout", Checkpoint(Progress("mysql-bin.000002", 500, 7)))
    m.update("third", Checkpoint(Progress("mysql-bin.000003", 4, 7)))
    assert(m.getMinProgress == Progress("mysql-bin.000002", 500, 7))
  }

  test("zero checkpoints are skipped; all-zero yields zero") {
    val m = new CkpManager(new MemoryCkpStorage)
    m.update("a", Checkpoint(Progress.zero))
    assert(m.getMinProgress.isZero)
    m.update("b", Checkpoint(Progress("mysql-bin.000001", 42, 7)))
    assert(m.getMinProgress == Progress("mysql-bin.000001", 42, 7))
  }

  test("different server_ids fall back to aligned progress") {
    val m = new CkpManager(new MemoryCkpStorage)
    m.update("a", Checkpoint(Progress("mysql-bin.000002", 1000, 7)))
    m.update("b", Checkpoint(Progress("mysql-bin.000001", 99, 8)))
    assertThrows[IllegalStateException](m.getMinProgress) // no aligned progress
    m.setAlignedProgress(Progress("mysql-bin.000001", 50, 8))
    assert(m.getMinProgress == Progress("mysql-bin.000001", 50, 8))
  }

  test("allReached drain barrier") {
    val m = new CkpManager(new MemoryCkpStorage)
    val target = Progress("mysql-bin.000002", 1000, 7)
    m.update("a", Checkpoint(Progress("mysql-bin.000002", 1000, 7)))
    m.update("b", Checkpoint(Progress("mysql-bin.000002", 900, 7)))
    assert(!m.allReached(target))
    m.update("b", Checkpoint(Progress("mysql-bin.000002", 1001, 7)))
    assert(m.allReached(target))
  }

  test("persistence round-trip incl. ctx and gtid") {
    val dir = Files.createTempDirectory("ckp")
    val storage = new FileCkpStorage(dir)
    val m = new CkpManager(storage)
    m.update("kafka", Checkpoint(
      Progress(Position("mysql-bin.000002", 1000, 7),
        Some(GtidSet.parse("cb477437-aacb-11e8-90e7-0242ac110002:1-10"))),
      Map.empty).withIntCtx("acked_seq", 42).withIntCtx("acked_offset", 102333))
    m.setAlignedProgress(Progress("mysql-bin.000001", 4, 7))
    m.persist()

    val reloaded = new CkpManager(new FileCkpStorage(dir))
    val ckp = reloaded.get("kafka").get
    assert(ckp.progress.pos == Position("mysql-bin.000002", 1000, 7))
    assert(ckp.progress.gset.get.toString == "cb477437-aacb-11e8-90e7-0242ac110002:1-10")
    assert(ckp.getIntCtx("acked_seq", 0) == 42)
    assert(ckp.getIntCtx("acked_offset", 0) == 102333)
    assert(reloaded.getMinProgress == ckp.progress)
  }

  test("dual-file storage: last good version survives repeated saves") {
    val dir = Files.createTempDirectory("ckp2")
    val s = new FileCkpStorage(dir)
    (1 to 5).foreach(i => s.save(s"v$i".getBytes("UTF-8")))
    assert(new String(s.load().get, "UTF-8") == "v5")
    // a fresh handle (restart) also sees the newest version
    val s2 = new FileCkpStorage(dir)
    assert(new String(s2.load().get, "UTF-8") == "v5")
    s2.save("v6".getBytes("UTF-8"))
    assert(new String(s2.load().get, "UTF-8") == "v6")
  }

  test("empty storage loads as empty manager") {
    val dir = Files.createTempDirectory("ckp3")
    val m = new CkpManager(new FileCkpStorage(dir))
    assert(m.names.isEmpty)
    assert(m.getMinProgress.isZero)
  }
}
