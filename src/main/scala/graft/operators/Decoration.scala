package graft.operators

import graft.core.RecordChunk
import graft.functions.KvpPrefixSampler

/** Chunk decoration: prepend a sampled metadata prefix and enforce the
  * token budget, prefix winning over body
  * (reference: src/sampler/mod.rs:1470-1508, 1582-1620).
  */
object Decoration {

  /** Decorate one chunk for a given draw; pure. */
  def decorate(chunk: RecordChunk, sampler: Option[KvpPrefixSampler],
      draw: Long, maxWindowTokens: Int): RecordChunk = {
    sampler.flatMap(_.sample(s"${chunk.record_id}:$draw")) match {
      case None => chunk
      case Some(prefix) =>
        val prefixTokens = prefix.split("\\s+").count(_.nonEmpty)
        val bodyBudget = math.max(maxWindowTokens - prefixTokens, 0)
        val bodyToks = chunk.text.split("\\s+").filter(_.nonEmpty)
        val body = bodyToks.take(bodyBudget)
        val text = if (body.isEmpty) prefix else prefix + "\n" + body.mkString(" ")
        chunk.copy(text = text, tokens_estimate = prefixTokens + body.length)
    }
  }
}
