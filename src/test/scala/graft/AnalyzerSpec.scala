package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.functions.Analyzer

/** Analyzer invariants (SURVEY §5.2.2-3): totality, idempotence, pattern
  * conformance, and Scala/Catalyst implementation parity.
  */
class AnalyzerSpec extends AnyFunSuite {

  private def forAllSeeded[A](gen: Gen[A], n: Int)(check: A => Unit): Unit =
    TestKit.forAllSeeded(gen, n)(check)

  private val cfg = Analyzer.default

  test("edge cases: null, empty, whitespace, punctuation-only") {
    assert(Analyzer.tokenize(null) == Nil)
    assert(Analyzer.tokenize("") == Nil)
    assert(Analyzer.tokenize("  \t\n ") == Nil)
    assert(Analyzer.tokenize("!!! ... ---") == Nil)
  }

  test("unicode word-break: CJK, accents, digits, emoji, mixed") {
    assert(Analyzer.tokenize("Hello, Wörld 世界 42 café—test", Analyzer.noStopwords) ==
      Seq("hello", "wörld", "世界", "42", "café", "test"))
    assert(Analyzer.tokenize("ROCKET🚀ship", Analyzer.noStopwords) == Seq("rocket", "ship"))
  }

  test("stopword removal matches Spark ML english list") {
    assert(Analyzer.tokenize("the data and a table") == Seq("data", "table"))
    assert(Analyzer.englishStopwords.contains("the"))
  }

  test("query analysis: repeated terms carry qtf; ascending term order") {
    assert(Analyzer.analyzeQuery("data data data") == Seq(("data", 3)))
    assert(Analyzer.analyzeQuery("zebra Alpha zebra") == Seq(("alpha", 1), ("zebra", 2)))
  }

  test("property: total, pattern-conformant, idempotent on its own output") {
    forAllSeeded(Gen.asciiStr, 200) { s =>
      val toks = Analyzer.tokenize(s, cfg)
      assert(toks.forall(_.matches("[\\p{L}\\p{N}]+")))
      assert(toks.forall(t => !cfg.stopwords.contains(t)))
      val again = Analyzer.tokenize(toks.mkString(" "), cfg)
      assert(again == toks)
    }
    // targeted unicode strings (arbitrary unicode can hit unpaired
    // surrogates which no real text contains)
    val unicodeGen = Gen.listOf(Gen.oneOf(
      "café", "世界", "ДАННЫЕ", "42", "a-b_c", "x!y", "  ", "π≈3.14", "🚀",
      "ＡＢＣ", "İstanbul", "ß")).map(_.mkString(" "))
    forAllSeeded(unicodeGen, 100) { s =>
      val toks = Analyzer.tokenize(s, cfg)
      assert(toks.forall(_.matches("[\\p{L}\\p{N}]+")))
    }
  }

  test("Scala and Catalyst analyzers agree (index/query path parity)") {
    val spark = TestKit.spark
    import spark.implicits._
    val samples: Seq[String] =
      TestKit.TranscriptGen.turns(seed = 7, nConvs = 30).map(_.text) ++
        Seq(null, "", "   ", "Hello, Wörld 世界 42 café—test", "ROCKET🚀ship",
          "the DATA and a Table", "İİİ", "ẞss", "ＡＢＣ１２３",
          // fused-analyzer boundary cases: pure-ASCII fast path (upper,
          // lower, stopword-cased, digit runs, no-op rows), length-changing
          // ROOT lowercase, supplementary-plane numbers (No category),
          // Roman numerals (Nl), combining marks as separators
          "PURE ASCII UPPER 123", "already lower 456", "THE The the",
          "a", "Z", "1", "!@#$", "x".repeat(1000) + " THE end",
          "İstanbul", "İ", "Ⅻ roman", "① circled", "𝟘 math", "éclair",
          "mixed ASCII then 世界 then MORE ascii")
    val df = samples.toDF("text")
    val got = df.select(Analyzer.tokensCol($"text", cfg)).collect()
      .map(r => if (r.isNullAt(0)) null else r.getSeq[String](0))
    samples.zip(got).foreach { case (s, sparkToks) =>
      val scalaToks = Analyzer.tokenize(s, cfg)
      if (s == null) assert(sparkToks == null || sparkToks.isEmpty)
      else assert(sparkToks.toSeq == scalaToks, s"mismatch on: [$s]")
    }
  }

  test("lower_root pins Locale.ROOT semantics regardless of JVM default locale") {
    import org.apache.spark.unsafe.types.UTF8String
    // Turkish dotted/dotless I, German sharp s, Greek final sigma, full
    // width: exactly the strings where default-locale lowercasing diverges
    Seq("İstanbul IS nice", "STRASSE ẞ", "ΟΔΟΣ", "ＡＢＣ", "plain ascii TEXT")
      .foreach { s =>
        val got = graft.plans.LowerRoot.lower(UTF8String.fromString(s)).toString
        assert(got == s.toLowerCase(java.util.Locale.ROOT), s"[$s]")
      }
  }

  test("analyzer fingerprint hashes stopword CONTENT, not just the count") {
    val a = Analyzer.Config(Set("foo"))
    val b = Analyzer.Config(Set("bar"))
    assert(a.fingerprint != b.fingerprint)
    assert(a.fingerprint == Analyzer.Config(Set("foo")).fingerprint)
  }
}
