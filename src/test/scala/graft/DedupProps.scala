package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.MinHashAgg
import graft.ops.DedupOps

/** ScalaCheck properties for the pure (driver-side) dedup math — the
  * algebraic laws the distributed plans rely on: partial-aggregation
  * safety needs merge to be commutative/associative/idempotent, and the
  * portable hash must stay in its contracted range. (The reference's
  * non-associative combiner misuse, LeanSort.java:145, is exactly the bug
  * class these laws exclude.)
  */
object DedupProps extends Properties("dedup") {

  private val agg = new MinHashAgg
  private def sig(hs: Seq[Long]): Seq[Long] =
    hs.foldLeft(agg.zero)(agg.reduce).toSeq

  private val hGen = Gen.chooseNum(0L, DedupOps.P - 1)
  private val hsGen = Gen.nonEmptyListOf(hGen)

  property("hash60Local is nonnegative and below 2^60") =
    forAll(Gen.asciiPrintableStr) { s =>
      val h = DedupOps.hash60Local(s)
      h >= 0L && h < (1L << 60)
    }

  property("hash60Local is stable (pure function)") =
    forAll(Gen.asciiPrintableStr) { s =>
      DedupOps.hash60Local(s) == DedupOps.hash60Local(s)
    }

  property("minhash merge commutes") = forAll(hsGen, hsGen) { (a, b) =>
    val m1 = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
    val m2 = agg.merge(b.foldLeft(agg.zero)(agg.reduce), a.foldLeft(agg.zero)(agg.reduce))
    m1.toSeq == m2.toSeq
  }

  property("minhash merge associates (any partial-agg tree)") =
    forAll(hsGen, hsGen, hsGen) { (a, b, c) =>
      def s(x: Seq[Long]) = x.foldLeft(agg.zero)(agg.reduce)
      val l = agg.merge(agg.merge(s(a), s(b)), s(c)).toSeq
      val r = agg.merge(s(a), agg.merge(s(b), s(c))).toSeq
      l == r
    }

  property("minhash signature ignores duplicates and order") =
    forAll(hsGen) { hs =>
      sig(hs) == sig(scala.util.Random.shuffle(hs ++ hs))
    }

  property("signature equals per-function modular minimum") =
    forAll(hsGen) { hs =>
      val expect = DedupOps.MinhashCoef.map { case (_, a, b, _, _) =>
        hs.map(h => (a * h + b) % DedupOps.P).min
      }
      sig(hs) == expect
    }

  // KGram.hashes is a pure function — property-test it against the
  // reference formulation (regex split + gram join + hash60Local) on
  // random text with random whitespace shapes. Texts are built from
  // word/ws atoms so empty runs, leading/trailing/multiple whitespace,
  // and multi-byte UTF-8 all occur.
  private val wordGen = Gen.oneOf(
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),
    Gen.oneOf("żółć", "中文", "tökén", "a", "@#$%", "x1"))
  private val wsGen = Gen.nonEmptyListOf(
    Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r')).map(_.mkString)
  private val textGen: Gen[String] = for {
    pairs <- Gen.listOf(Gen.zip(wordGen, wsGen))
    lead <- Gen.oneOf("", " ", "\t\n")
  } yield lead + pairs.map { case (w, s) => w + s }.mkString

  private def referenceGrams(text: String, k: Int): Seq[Long] = {
    val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
    (0 to toks.length - k).map(i =>
      DedupOps.hash60Local(toks.slice(i, i + k).mkString(" ")))
  }

  property("KGram.hashes equals regex-split + hash60 of joined grams") =
    forAll(textGen, Gen.chooseNum(1, 5)) { (text, k) =>
      val native = graft.functions.KGram
        .hashes(org.apache.spark.unsafe.types.UTF8String.fromString(text), k)
        .toLongArray.toSeq
      native == referenceGrams(text, k)
    }

  // Char-gram twin: windows are CODE POINTS (a substr unit in both
  // engines), so the reference slices by code point — astral atoms
  // (4-byte UTF-8, surrogate pairs in the JVM string) exercise the
  // boundary walk beyond what BMP text can.
  private val charTextGen: Gen[String] = for {
    base <- textGen
    astral <- Gen.oneOf("", "😀", "𝕏🌀")
    pos <- Gen.chooseNum(0, base.length)
    // never split a surrogate pair in the host string
    at = if (pos > 0 && Character.isHighSurrogate(base.charAt(pos - 1))) pos - 1 else pos
  } yield base.substring(0, at) + astral + base.substring(at)

  private def referenceCharGrams(text: String, k: Int): Seq[Long] = {
    val cps = text.codePoints().toArray
    (0 to cps.length - k).map(i =>
      DedupOps.hash60Local(new String(cps, i, k)))
  }

  property("KGram.charGramHashes equals code-point substring + hash60") =
    forAll(charTextGen, Gen.chooseNum(1, 9)) { (text, k) =>
      val native = graft.functions.KGram
        .charGramHashes(
          org.apache.spark.unsafe.types.UTF8String.fromString(text), k)
        .toLongArray.toSeq
      native == referenceCharGrams(text, k)
    }
}
