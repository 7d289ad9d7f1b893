package graft

import java.io.ByteArrayInputStream

import graft.sources.PackedExport

/** PackedExport maintenance seams: the constant-memory verification
  * walk ([[PackedExport.walkIdStream]]) against crafted id streams —
  * including reads that split every id across buffer boundaries — and
  * the rootless packed-store GC sweeping decommissioned corpora's
  * deliverable trees while live keys survive.
  */
class PackedStoreMaintSpec extends SparkSpec {

  private def leBytes(ids: Seq[Int]): Array[Byte] = {
    val out = new Array[Byte](ids.length * 4)
    ids.zipWithIndex.foreach { case (id, i) =>
      out(i * 4) = (id & 0xFF).toByte
      out(i * 4 + 1) = ((id >>> 8) & 0xFF).toByte
      out(i * 4 + 2) = ((id >>> 16) & 0xFF).toByte
      out(i * 4 + 3) = ((id >>> 24) & 0xFF).toByte
    }
    out
  }

  private def expected(bytes: Array[Byte]): (Long, Long, Long) = {
    val crc = new java.util.zip.CRC32
    crc.update(bytes)
    val n = bytes.length / 4
    var sum = 0L
    (0 until n).foreach { i =>
      val o = i * 4
      val id = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
        ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24)
      sum += (id.toLong + 1L) * (i + 1L)
    }
    (bytes.length.toLong, crc.getValue, sum)
  }

  /** An InputStream that yields at most `chunk` bytes per read — the
    * misaligned-read adversary for the walker's carry logic.
    */
  private final class Drip(bytes: Array[Byte], chunk: Int)
      extends java.io.InputStream {
    private val in = new ByteArrayInputStream(bytes)
    override def read(): Int = in.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      in.read(b, off, math.min(len, chunk))
  }

  test("walkIdStream: crafted streams, misaligned reads, partial tails") {
    val ids = Seq(0, 1, 255, 256, 65535, 65536, 42, Int.MaxValue,
      0x7f123456, 999983) ++ (0 until 100000).map(i => (i * 2654435761L).toInt & 0x7FFFFFFF)
    val bytes = leBytes(ids)
    val want = expected(bytes)
    assert(PackedExport.walkIdStream(new ByteArrayInputStream(bytes)) == want)
    // every id split across read boundaries (3-byte reads)
    assert(PackedExport.walkIdStream(new Drip(bytes, 3)) == want)
    // read sizes coprime with both the id width and the buffer
    assert(PackedExport.walkIdStream(new Drip(bytes, 4097)) == want)
    // empty stream
    assert(PackedExport.walkIdStream(
      new ByteArrayInputStream(Array.empty[Byte])) == ((0L, 0L, 0L)))
    // a truncated tail counts toward length/CRC but decodes no id
    val torn = bytes ++ Array[Byte](7, 9)
    val (tLen, tCrc, tSum) = PackedExport.walkIdStream(
      new ByteArrayInputStream(torn))
    val tornCrc = new java.util.zip.CRC32
    tornCrc.update(torn)
    assert(tLen == torn.length.toLong && tCrc == tornCrc.getValue &&
      tSum == want._3)
  }

  test("rootless packed-store gc removes dead corpora, keeps live keys") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-packed-gc").toFile
    val liveKey = Artifacts.corpusKey(sf)
    val live = new java.io.File(base, liveKey)
    val dead = new java.io.File(base, "deadbeef_gone")
    try {
      assert(new java.io.File(live, "by_doc_id/k1").mkdirs())
      assert(new java.io.File(dead, "by_doc_id/k2").mkdirs())
      val removed = PackedExport.gcAt(base, Set(liveKey))
      assert(removed == Seq("deadbeef_gone"), s"removed: $removed")
      assert(!dead.exists(), "dead corpus tree must be swept")
      assert(new java.io.File(live, "by_doc_id/k1").isDirectory,
        "live corpus tree must survive")
      // empty/missing base is a quiet no-op
      assert(PackedExport.gcAt(
        new java.io.File(base, "absent"), Set.empty).isEmpty)
    } finally deleteRecursively(base)
  }
}
