package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The single-scan feature extractor must agree EXACTLY with the regex
  * definitions the oracle (and the documents-table Column rules) use. Fuzzed
  * over adversarial inputs: control chars, unicode, runs, symbol soup.
  */
class CaptionFeaturesSpec extends AnyFunSuite {

  private val symbolRe = java.util.regex.Pattern.compile("[^A-Za-z0-9 \\t\\n\\r]")

  // char-run semantics: ANY repeated char counts, including line terminators
  // — [\s\S], not `.` (which skips \n and made the streaming Column path
  // disagree with this extractor on newline-run captions; ADVICE round 1)
  private def regexFeatures(s: String, maxRun: Int): CaptionFeatures = {
    val toks = s.split("\\s+").filter(_.nonEmpty)
    val symbols = s.length - symbolRe.matcher(s).replaceAll("").length
    val hasRun = java.util.regex.Pattern.compile(s"([\\s\\S])\\1{${maxRun - 1},}").matcher(s).find()
    CaptionFeatures(s.length, toks.length, toks.distinct.length, symbols, hasRun)
  }

  private val weird = Gen.oneOf(
    "a", " ", "\t", "\n", "\r", "", "\f", "Z", "9", "$", "#", "猫", "é", "ß",
    "aaaaaaa", "ab", "   ", "x y", "!!!!!!",
    "\n\n\n", "\n\n\n\n\n\n", "\r\r\r\r\r\r\r", "\t\t\t\t\t\t")

  test("fuzz: extract == regex definitions (10k samples)") {
    val gen = Gen.listOfN(12, weird).map(_.mkString)
    (0 until 10000).foreach { i =>
      val s = gen.apply(Gen.Parameters.default, Seed(1000L + i)).getOrElse("")
      val fast = CaptionFeatures.extract(s, 6)
      val slow = regexFeatures(s, 6)
      assert(fast == slow, s"feature mismatch for ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("null caption → null features") {
    assert(CaptionFeatures.extract(null, 6) == null)
  }

  test("fuzz: fused scrubWithCounts == scrubScala + scrubCountsScala") {
    val word = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.oneOf("a@b.com", "x@y.org more", "555-01-2345", "+1 555-123-4567",
        "(555) 123-4567", "badword", "BADWORD", "slurx!", "123-45-6789"))
    val gen = Gen.listOfN(8, word).map(_.mkString(" "))
    (0 until 3000).foreach { i =>
      val s = gen.apply(Gen.Parameters.default, Seed(77L + i)).getOrElse("")
      val (fusedText, fusedCounts) = Scrubber.scrubWithCounts(s)
      assert(fusedText == Scrubber.scrubScala(s), s"scrub text mismatch for '$s'")
      val slowCounts = Scrubber.scrubCountsScala(s)
      Scrubber.categoryNames.zip(fusedCounts).foreach { case (n, c) =>
        assert(c == slowCounts(n), s"count $n mismatch for '$s'")
      }
    }
  }
}
