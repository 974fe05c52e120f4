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

  test("accuracy on the synthetic corpus's true caption languages") {
    var total = 0
    var correct = 0
    (0L until 3000L).foreach { i =>
      val (row, trueLang) = graft.corpus.SyntheticImages.rowWithLang(i, 42L)
      // judge only clean multi-word captions (the realistic langid regime)
      if (trueLang != null && row.caption != null &&
          row.caption.split("\\s+").count(_.nonEmpty) >= 6) {
        total += 1
        if (LangId.predict(row.caption)._1 == trueLang) correct += 1
      }
    }
    val acc = correct.toDouble / total
    info(s"langid accuracy on $total clean captions: $acc")
    assert(acc >= 0.85, s"accuracy $acc below 0.85")
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
