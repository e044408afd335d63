package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Streaming ingestion against a STATIC corpus — the stream-static join
  * family (the third join mode next to batch and stream-stream): a
  * landing stream of documents is filtered against the existing corpus
  * without any stream-side state beyond the running micro-batch, because
  * the static side is just a DataFrame Spark re-plans per batch.
  *
  * Scale posture: the corpus side reduces to a distinct fingerprint
  * column (8 bytes/doc, prunable scan); the join is stream-static
  * left-anti, so each micro-batch shuffles only its own rows. The
  * fingerprint is the codegen'd polynomial hash — stateless per row. */
object CorpusStreams {

  /** Drop stream documents whose exact text fingerprint already appears
    * in the static corpus (exact-dup ingestion gate). Identical plan on
    * batch input — the batch result is the contract the streaming spec
    * asserts against. */
  def dedupAgainstCorpus(stream: DataFrame, corpus: DataFrame,
                         textCol: String = "text"): DataFrame = {
    val known = corpus
      .select(TextAnalysis.fingerprint(col(textCol)).as("__fp")).distinct()
    stream
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .join(known, Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Stateless streaming quality gate: the same fused corpus-filter
    * predicates (length floor, quality score, repetition cap, PII-free)
    * applied per micro-batch row — no state, no watermark needed. */
  def qualityGate(stream: DataFrame, textCol: String = "text",
                  minTokens: Int = 20, minQuality: Double = 0.2,
                  maxDup3: Double = 0.1): DataFrame = {
    val t = col(textCol)
    val flags = TextAnalysis.contentFlags(t).toMap
    stream.filter(size(TextAnalysis.tokens(t)) >= minTokens &&
      TextAnalysis.qualityScore(t) > minQuality &&
      TextAnalysis.dupGramFraction(t, 3) <= maxDup3 &&
      !flags("has_url") && !flags("has_email"))
  }
}
