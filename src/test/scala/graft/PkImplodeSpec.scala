package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PkImplode

/** PKWare DCL "implode" codec: format conformance against the published
  * test vector (zlib contrib blast's example stream), then
  * compress→decompress round-trips across data shapes that exercise
  * literals, short/long matches, window-deep distances, and the 518-byte
  * match cap.
  */
class PkImplodeSpec extends AnyFunSuite {

  test("explode reproduces the published blast conformance vector") {
    // Coded with PKWARE's own compressor (raw-literal mode, 1 KiB window):
    // the one fixed point any conformant decoder must hit.
    val in = Array(0x00, 0x04, 0x82, 0x24, 0x25, 0x8f, 0x80, 0x7f).map(_.toByte)
    assert(new String(PkImplode.explode(in), "US-ASCII") == "AIAIAIAIAIAIA")
  }

  test("explode rejects malformed headers") {
    intercept[IllegalArgumentException] {
      PkImplode.explode(Array[Byte](2, 4, 0)) // literal mode must be 0/1
    }
    intercept[IllegalArgumentException] {
      PkImplode.explode(Array[Byte](0, 7, 0)) // dictBits must be 4..6
    }
  }

  private def roundTrip(data: Array[Byte]): Unit = {
    val packed = PkImplode.implode(data)
    assert(PkImplode.explode(packed).sameElements(data))
  }

  test("implode -> explode round-trips across data shapes") {
    roundTrip(Array.emptyByteArray)
    roundTrip("x".getBytes)
    roundTrip("AIAIAIAIAIAIA".getBytes)
    roundTrip(("the quick brown fox " * 40).getBytes) // long runs > 518 cap
    roundTrip(Array.fill(10000)(0x41.toByte)) // max-length matches chained
    // deterministic pseudo-random: incompressible, all-literal path
    val rnd = new scala.util.Random(42)
    roundTrip(Array.fill(5000)(rnd.nextInt(256).toByte))
    // repeats separated by more than the 4 KiB window: matcher must not
    // emit out-of-window distances
    val far = ("HEADER" + "z" * 5000 + "HEADER" + "z" * 100).getBytes
    roundTrip(far)
    // every byte value, then repeated (full-alphabet literals + matches)
    val all = Array.tabulate(256)(_.toByte)
    roundTrip(all ++ all ++ all)
  }

  test("compression actually shrinks repetitive record blocks") {
    val records = (0 until 500).map(i => f"REC$i%05d  CODE42  PT ").mkString.getBytes
    val packed = PkImplode.implode(records)
    assert(packed.length < records.length / 2,
      s"expected <half size, got ${packed.length} of ${records.length}")
    assert(PkImplode.explode(packed).sameElements(records))
  }
}
