package graft.tools

import graft.core._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Soak-level fuzz: 2000 cases per property (vs 50-200 in CI) across codec
  * round-trips and matcher equivalence. Run occasionally, not in CI.
  */
object Soak {
  def check(name: String, p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    println(f"$name%-28s passed=${res.passed} ${res.status}")
    assert(res.passed, s"$name failed: ${res.status}")
  }

  def main(args: Array[String]): Unit = {
    val genToks: Gen[Array[Int]] = Gen.oneOf(
      Gen.const(Array.emptyIntArray),
      Gen.listOf(Gen.chooseNum(Int.MinValue, Int.MaxValue)).map(_.toArray),
      Gen.listOf(Gen.choose(0, 5)).map(_.toArray),
      Gen.choose(0, 2000).flatMap(n => Gen.containerOfN[Array, Int](n, Gen.choose(0, 50))))
    val genRow: Gen[Array[Int]] =
      Gen.choose(0, 150).flatMap(n => Gen.containerOfN[Array, Int](n, Gen.choose(0, 6)))
    val genPart: Gen[Array[Int]] =
      Gen.choose(1, 10).flatMap(n => Gen.containerOfN[Array, Int](n, Gen.choose(0, 6)))

    for (codec <- Codecs.all) {
      check(s"roundtrip-${codec.name}", Prop.forAll(Gen.listOfN(20, genToks)) { rowsL =>
        val rows = rowsL.toIndexedSeq
        val stats = ChunkStats.compute(rows)
        val eligible = !((codec eq DictCodec) && stats.distinctSorted.isEmpty) &&
          !((codec eq BitPackCodec) && stats.minTok < 0)
        if (!eligible) true
        else {
          val header = codec.buildHeader(rows, stats)
          val enc = codec.encoder(header)
          val out = new ByteWriter()
          val offs = new Array[Int](rows.length + 1)
          rows.zipWithIndex.foreach { case (r, i) => enc.encode(r, out); offs(i + 1) = out.size }
          val dec = codec.decoder(header)
          rows.indices.forall(i => java.util.Arrays.equals(dec.decode(out.toBytes, offs(i), offs(i + 1)), rows(i)))
        }
      }, 2000)
    }

    check("matchers-vs-oracle", Prop.forAll(Gen.listOfN(15, genRow), genPart) { (rowsL, part) =>
      val rows = rowsL.toIndexedSeq
      val header = FsstTokenCodec.buildHeader(rows, ChunkStats.compute(rows))
      val st = SymTab.fromBytes(header)
      val enc = FsstTokenCodec.encoder(header)
      val out = new ByteWriter()
      val offs = new Array[Int](rows.length + 1)
      rows.zipWithIndex.foreach { case (r, i) => enc.encode(r, out); offs(i + 1) = out.size }
      val data = out.toBytes
      val pm = new PatternMachine(Array(part), st)
      rows.indices.forall { i =>
        FsstMatch.contains(data, offs(i), offs(i + 1), pm) == TokenMatch.contains(rows(i), part) &&
        FsstMatch.prefix(data, offs(i), offs(i + 1), st, part) == TokenMatch.prefix(rows(i), part) &&
        FsstMatch.suffix(data, offs(i), offs(i + 1), pm) == TokenMatch.suffix(rows(i), part) &&
        FsstMatch.equalsPat(data, offs(i), offs(i + 1), st, part) == TokenMatch.equalsPat(rows(i), part)
      }
    }, 2000)

    check("multi-infix-vs-oracle", Prop.forAll(Gen.listOfN(15, genRow),
      Gen.choose(1, 4).flatMap(k => Gen.listOfN(k, genPart)).map(_.toArray)) { (rowsL, parts) =>
      val rows = rowsL.toIndexedSeq
      val header = FsstTokenCodec.buildHeader(rows, ChunkStats.compute(rows))
      val st = SymTab.fromBytes(header)
      val enc = FsstTokenCodec.encoder(header)
      val out = new ByteWriter()
      val offs = new Array[Int](rows.length + 1)
      rows.zipWithIndex.foreach { case (r, i) => enc.encode(r, out); offs(i + 1) = out.size }
      val pm = new PatternMachine(parts, st)
      rows.indices.forall { i =>
        FsstMatch.multiInfix(out.toBytes, offs(i), offs(i + 1), pm) == TokenMatch.multiInfix(rows(i), parts)
      }
    }, 2000)

    println("SOAK OK")
  }
}
