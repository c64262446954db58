package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.index.Codec

/** Codec properties (SURVEY §5.2.2 / FIXTURES §5): varint + delta block
  * roundtrip over sorted docId lists with gaps from 1 up to ~2^40.
  */
class CodecSpec extends AnyFunSuite {

  private def forAllSeeded[A](gen: Gen[A], n: Int)(check: A => Unit): Unit =
    TestKit.forAllSeeded(gen, n)(check)

  test("varint roundtrip across magnitudes") {
    val vals = Seq(0L, 1L, 127L, 128L, 300L, 16383L, 16384L,
      Int.MaxValue.toLong, 1L << 40, Long.MaxValue)
    vals.foreach { v =>
      val out = new java.io.ByteArrayOutputStream()
      Codec.writeVarLong(out, v)
      val (got, read) = Codec.readVarLong(out.toByteArray, 0)
      assert(got == v)
      assert(read == out.size())
    }
  }

  test("block roundtrip: gaps of 1 and huge gaps") {
    val postings = Seq(
      Codec.P(0L, 1, 5),
      Codec.P(1L, 2, 10),
      Codec.P(2L, 300, 100000),
      Codec.P((1L << 40) + 7, 1, 1),
      Codec.P((1L << 40) + 8, 9, 42))
    val bytes = Codec.encode(postings)
    assert(Codec.decode(bytes, postings.size).toSeq == postings)
  }

  test("property: roundtrip on random strictly-ascending lists") {
    val gen = for {
      n <- Gen.choose(1, Codec.BlockSize)
      first <- Gen.choose(0L, 1L << 41)
      deltas <- Gen.listOfN(n - 1, Gen.oneOf(Gen.choose(1L, 5L), Gen.choose(1L, 1L << 39)))
      tfs <- Gen.listOfN(n, Gen.choose(1, 1000000))
      dls <- Gen.listOfN(n, Gen.choose(0, 1000000))
    } yield {
      val ids = deltas.scanLeft(first)(_ + _)
      ids.lazyZip(tfs).lazyZip(dls).map(Codec.P.apply).toVector
    }
    forAllSeeded(gen, 300) { ps =>
      val bytes = Codec.encode(ps)
      assert(Codec.decode(bytes, ps.size).toVector == ps)
    }
  }

  test("delta compression beats raw fixed-width on dense lists") {
    val dense = (0 until 128).map(i => Codec.P(i.toLong * 2, 1, 50))
    val bytes = Codec.encode(dense)
    assert(bytes.length < 128 * 16, s"encoded ${bytes.length}B >= raw 2048B")
  }

  test("encode rejects non-ascending docIds") {
    intercept[IllegalArgumentException] {
      Codec.encode(Seq(Codec.P(5, 1, 1), Codec.P(5, 1, 1)))
    }
  }

  test("encodeRaw is byte-identical to encode on random posting lists") {
    val gen = for {
      n <- Gen.choose(1, 128)
      gaps <- Gen.listOfN(n, Gen.choose(1L, 1000L))
      tfs <- Gen.listOfN(n, Gen.choose(1, 500))
      dls <- Gen.listOfN(n, Gen.choose(0, 5000))
    } yield {
      val ids = gaps.scanLeft(-1L)(_ + _).tail
      (ids.toArray, tfs.toArray, dls.toArray)
    }
    forAllSeeded(gen, 300) { case (ids, tfs, dls) =>
      val ps = ids.indices.map(i => Codec.P(ids(i), tfs(i), dls(i)))
      assert(java.util.Arrays.equals(
        Codec.encodeRaw(ids, tfs, dls, ids.length), Codec.encode(ps)),
        "encodeRaw bytes diverge from encode")
    }
  }
}
