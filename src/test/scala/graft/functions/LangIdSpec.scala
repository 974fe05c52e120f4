package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class LangIdSpec extends AnyFunSuite {

  test("anchor-word sentences classify to their language") {
    assert(LangId.predict("the photo of the cat with the dog and this light")._1 == "en")
    assert(LangId.predict("el gato con la mesa que por la luz es una foto")._1 == "es")
    assert(LangId.predict("le chat est dans la rue avec une fleur pour le pont")._1 == "fr")
    assert(LangId.predict("der hund ist mit der katze und das licht nicht für den berg")._1 == "de")
    assert(LangId.predict("的 猫 是 在 桌子 的 光 不 了 我")._1 == "zh")
  }

  test("deterministic + confidence bounded") {
    val a = LangId.predict("the quick brown fox")
    val b = LangId.predict("the quick brown fox")
    assert(a == b)
    assert(a._2 > 0.0 && a._2 <= 1.0)
  }

  test("null/empty → und") {
    assert(LangId.predict(null) == (("und", 0.0)))
    assert(LangId.predict("") == (("und", 0.0)))
  }

  test("concatenation keeps dominant language (averaging stability)") {
    val en = "the photo of the cat with the dog and this light for the sky"
    assert(LangId.predict(en + " " + en)._1 == "en")
  }
}

class PerplexitySpec extends AnyFunSuite {
  test("in-domain prose scores lower than gibberish") {
    val prose = Perplexity.score("a photo of a cat sitting on a wooden table")
    val gibberish = Perplexity.score("qzxj wvkq zzqx jjwx qqqz xkjv")
    val symbols = Perplexity.score("$#@! %^&* ()=+ ~~~~")
    assert(prose < gibberish)
    assert(prose < symbols)
  }
  test("deterministic") {
    assert(Perplexity.score("hello world") == Perplexity.score("hello world"))
  }
  test("null/empty → NaN") {
    assert(Perplexity.score(null).isNaN)
    assert(Perplexity.score("").isNaN)
  }
}
