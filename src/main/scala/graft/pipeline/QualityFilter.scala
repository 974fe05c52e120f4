package graft.pipeline

import graft.corpus.ImageRow
import graft.functions.{LangId, Perplexity, Scrubber, TextFunctions => TF}
import graft.rules.{Rule, RuleEngine}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Scored input row: ImageRow + model scores (langid + perplexity). */
final case class ScoredImage(
    image_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String,
    caption: String,
    phash: Long,
    lang: String,
    lang_conf: Double,
    ppl: Double)

/** Thresholds for the quality rule set — the analog of the reference's
  * per-rule options metadata (`SchemaUtil.scala:540-558`). One instance is
  * THE contract shared by the Spark plan and the pure-Scala oracle.
  */
final case class FilterConfig(
    minCaptionLen: Int = 10,
    maxCaptionLen: Int = 2000,
    minTokens: Int = 3,
    minDistinctTokenRatio: Double = 0.4,
    maxSymbolRatio: Double = 0.30,
    maxCharRun: Int = 6,
    minDim: Int = 16,
    maxDim: Int = 8192,
    maxAspect: Int = 8,
    allowedFormats: Seq[String] = Seq("png", "jpeg", "bmp", "webp"),
    minLangConf: Double = 0.21,
    allowedLangs: Seq[String] = LangId.languages,
    maxPerplexity: Double = 50000.0)

/** The quality-filter stage (north rule): langid + perplexity scoring,
  * declarative heuristic rules compiled to Column expressions, PII/toxicity
  * scrub — one pass, one projection, keep/drop + first-failing-rule reason
  * per row (SURVEY §7.1: replaces the reference's per-rule
  * `where(!expr).count()` loop with a single `select`).
  */
object QualityFilter {

  /** Model scoring via mapPartitions over the typed Dataset (SURVEY §7.3):
    * langid + perplexity share one partition-level pass; the models are
    * broadcast once per executor (they are also JVM-static, but broadcast is
    * the contract that survives a real cluster with external weights).
    */
  def score(spark: SparkSession, input: Dataset[ImageRow]): Dataset[ScoredImage] = {
    import spark.implicits._
    val langIdB = spark.sparkContext.broadcast(LangId)
    val pplB = spark.sparkContext.broadcast(Perplexity)
    input.mapPartitions { it =>
      val langId = langIdB.value
      val ppl = pplB.value
      it.map { r =>
        val (lang, conf) = langId.predict(r.caption)
        ScoredImage(r.image_id, r.bytes, r.w, r.h, r.fmt, r.caption, r.phash,
          lang, conf, ppl.score(r.caption))
      }
    }
  }

  /** Canonical rule order — part of the oracle contract (first failing rule
    * is the drop reason). Heuristics are pure Column expressions
    * (WholeStageCodegen); model thresholds read the scored columns.
    */
  def rules(cfg: FilterConfig): Seq[Rule] = {
    val cap = col("caption")
    Seq(
      Rule("caption_missing", cap.isNotNull && length(trim(cap)) > 0),
      Rule("caption_length", length(cap).between(cfg.minCaptionLen, cfg.maxCaptionLen)),
      Rule("caption_few_tokens", TF.tokenCount(cap) >= cfg.minTokens),
      Rule("caption_repetitive", TF.distinctTokenRatio(cap) >= cfg.minDistinctTokenRatio),
      Rule("caption_symbolic", TF.symbolRatio(cap) <= cfg.maxSymbolRatio),
      Rule("caption_char_run", !TF.hasCharRun(cap, cfg.maxCharRun)),
      Rule("image_dims",
        col("w").between(cfg.minDim, cfg.maxDim) && col("h").between(cfg.minDim, cfg.maxDim)),
      Rule("image_aspect",
        greatest(col("w"), col("h")) <= lit(cfg.maxAspect) * least(col("w"), col("h"))),
      Rule("image_fmt", col("fmt").isin(cfg.allowedFormats: _*)),
      Rule("lang_unknown",
        col("lang_conf") >= cfg.minLangConf && col("lang").isin(cfg.allowedLangs: _*)),
      Rule("high_perplexity", col("ppl") <= cfg.maxPerplexity),
    )
  }

  /** Full stage: score → annotate(keep, drop_reason) → scrub kept captions.
    * Everything after the mapPartitions scoring is a single codegen'd
    * projection; no shuffle anywhere in this stage.
    */
  def run(spark: SparkSession, input: Dataset[ImageRow], cfg: FilterConfig = FilterConfig()): DataFrame = {
    val scored = score(spark, input).toDF()
    val annotated = RuleEngine.annotate(scored, rules(cfg))
    annotated
      .withColumn("scrubbed_caption", when(col(RuleEngine.KeepCol), Scrubber.scrub(col("caption"))))
      .withColumn("scrub_counts", when(col(RuleEngine.KeepCol), Scrubber.scrubCounts(col("caption"))))
  }
}
