package graft.functions

/** fastText-style language identifier (north rule): hashed character n-gram
  * embeddings, averaged, then a linear layer + softmax.
  *
  * The model is fully deterministic and self-contained: bucket embeddings are
  * pseudo-random vectors keyed by bucket index (splitmix64 — no training
  * artifact to load), and each language's weight row is the mean embedding of
  * that language's anchor words ("hash-anchored prototypes"). This gives a
  * real, functioning classifier for the marker vocabularies with zero
  * external data, and — critically for the F1 contract — the SAME pure
  * function serves as both the engine UDF and the oracle
  * ([[graft.pipeline.Oracle]] calls [[predict]] directly).
  *
  * Scale notes: weights are ~256 KB → broadcast once per executor (the
  * pipeline wraps the model in `sparkContext.broadcast`, same pattern as the
  * reference's broadcast lookup join,
  * `core/foreignkey/strategy/DistributedSamplingStrategy.scala:60-95`). The
  * UDF has a narrow String→struct signature so the surrounding plan stays in
  * WholeStageCodegen (SURVEY §7.3).
  */
object LangId extends Serializable {

  val dims = 16
  val buckets = 4096
  val minNgram = 2
  val maxNgram = 3
  /** Softmax temperature over cosine logits. */
  val scale = 8.0

  val languages: Vector[String] = Vector("en", "es", "fr", "de", "zh")

  /** Anchor vocabularies per language (public common stopwords). */
  val anchors: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "with", "this", "that", "for", "is"),
    "es" -> Seq("el", "la", "los", "las", "una", "que", "por", "con", "es"),
    "fr" -> Seq("le", "les", "des", "une", "est", "que", "pour", "avec", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "ein", "nicht", "für"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他"),
  )

  // --- deterministic pseudo-random embedding table ---

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit over UTF-8 bytes — stable, dependency-free. */
  def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Embedding table: buckets × dims in [-1, 1), generated lazily once per
    * JVM (deterministic — independent of partitioning/parallelism).
    */
  lazy val embeddings: Array[Array[Double]] = {
    val e = Array.ofDim[Double](buckets, dims)
    var b = 0
    while (b < buckets) {
      var j = 0
      while (j < dims) {
        val r = splitmix64(b.toLong * 131 + j)
        e(b)(j) = (r >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
        j += 1
      }
      b += 1
    }
    e
  }

  /** Char n-grams are taken PER TOKEN with `^`/`$` word-boundary padding
    * (fastText's subword convention): the n-grams of the word "the" inside a
    * sentence are then identical to the n-grams of the anchor word "the",
    * which is what makes the hash-anchored prototypes discriminative.
    */
  private def charNgrams(token: String): Iterator[String] = {
    val t = "^" + token + "$"
    (minNgram to maxNgram).iterator.flatMap { n =>
      if (t.length < n) Iterator.empty
      else (0 to t.length - n).iterator.map(i => t.substring(i, i + n))
    }
  }

  /** Mean hashed-n-gram embedding over all tokens; zero vector for empty. */
  def embed(text: String): Array[Double] = {
    val acc = new Array[Double](dims)
    var n = 0
    text.toLowerCase.split("\\s+").iterator.filter(_.nonEmpty).foreach { tok =>
      charNgrams(tok).foreach { g =>
        val b = java.lang.Math.floorMod(fnv1a(g), buckets.toLong).toInt
        val row = embeddings(b)
        var j = 0
        while (j < dims) { acc(j) += row(j); j += 1 }
        n += 1
      }
    }
    if (n > 0) { var j = 0; while (j < dims) { acc(j) /= n; j += 1 } }
    acc
  }

  /** Language prototype rows = mean anchor-word embedding, L2-normalized. */
  lazy val weights: Array[Array[Double]] = languages.map { lang =>
    val acc = new Array[Double](dims)
    val ws = anchors(lang)
    ws.foreach { w =>
      val e = embed(w)
      var j = 0
      while (j < dims) { acc(j) += e(j); j += 1 }
    }
    val norm = math.sqrt(acc.map(x => x * x).sum)
    if (norm > 0) acc.map(_ / norm) else acc
  }.toArray

  /** (language, confidence): softmax over scaled cosine similarities.
    * Deterministic pure function; ties broken by language order (stable).
    */
  def predict(text: String): (String, Double) = {
    if (text == null || text.isEmpty) return ("und", 0.0)
    val e = embed(text)
    val norm = math.sqrt(e.map(x => x * x).sum)
    if (norm == 0) return ("und", 0.0)
    val logits = weights.map { w =>
      var dot = 0.0
      var j = 0
      while (j < dims) { dot += w(j) * e(j); j += 1 }
      scale * dot / norm
    }
    val mx = logits.max
    val exps = logits.map(l => math.exp(l - mx))
    val z = exps.sum
    var best = 0
    var i = 1
    while (i < logits.length) { if (logits(i) > logits(best)) best = i; i += 1 }
    (languages(best), exps(best) / z)
  }
}
