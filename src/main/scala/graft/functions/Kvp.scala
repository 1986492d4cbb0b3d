package graft.functions

import graft.core.Determinism
import java.security.MessageDigest

/** Metadata-prefix (KVP) sampling (reference: src/kvp.rs:10-217).
  *
  * The reference drives rolls from a mutable `Rng`; here each roll draws
  * from a counter-based deterministic stream seeded by an arbitrary string
  * key — in pipelines that key is `(record id, draw counter)`, satisfying
  * the "dropout per sample, not per record" contract
  * (SURVEY.md §7.4): the same record decorates differently across draws
  * but identically across runs, partitions, and executors.
  *
  * Render semantics (kvp.rs:119-149, 203-217): dropout roll gates the whole
  * prefix; a uniform variant choice; per-field presence roll then uniform
  * value choice, rendered `key=value`; multi-field bodies are shuffled;
  * final format `meta: k=v | k2=v2`.
  */
case class KvpField(key: String, values: Seq[String], presence: Float = 1.0f) {
  /** De-duplicated, order-preserving, blanks dropped (kvp.rs:22-46). */
  def normalized: KvpField =
    copy(values = values.filter(_.nonEmpty).distinct,
      presence = math.max(0f, math.min(1f, presence)))
  def isEmpty: Boolean = normalized.values.isEmpty
}

case class KvpPrefixSampler(dropout: Float, variants: Seq[Seq[KvpField]]) {
  def normalized: KvpPrefixSampler = KvpPrefixSampler(
    math.max(0f, math.min(1f, dropout)),
    variants.map(_.map(_.normalized).filterNot(_.isEmpty)).filter(_.nonEmpty))

  /** All keys → all values across variants, no rolls (kvp.rs:128-149). */
  def allMetadata: Map[String, Seq[String]] = {
    val n = normalized
    n.variants.flatten.groupBy(_.key).map { case (k, fs) =>
      k -> fs.flatMap(_.values).distinct
    }
  }

  /** Deterministic sample for a stream key (e.g. "recordId:draw"). */
  def sample(streamKey: String): Option[String] = {
    val s = normalized
    if (s.variants.isEmpty || s.dropout <= 0f) return None
    val rng = new Kvp.DetRng(streamKey)
    if (s.dropout < 1f && rng.nextUnit() >= s.dropout) return None
    val variant = s.variants(rng.nextInt(s.variants.size))
    val body = variant.flatMap { f =>
      if (f.presence <= 0f) None
      else if (f.presence < 1f && rng.nextUnit() >= f.presence) None
      else Some(s"${f.key}=${f.values(rng.nextInt(f.values.size))}")
    }
    if (body.isEmpty) None
    else {
      val ordered = if (body.size > 1) rng.shuffle(body) else body
      Some(s"meta: ${ordered.mkString(" | ")}")
    }
  }
}

object Kvp {

  /** Counter-based deterministic random stream: roll i = md5-hash of
    * `"<seed>#<i>"` (same construction as core.Determinism, driver-side). */
  final class DetRng(seed: String) {
    private var counter = 0L
    private val md = MessageDigest.getInstance("MD5")

    def nextLong(): Long = {
      val bytes = md.digest(s"$seed#$counter".getBytes("UTF-8"))
      counter += 1
      // first 4 bytes as unsigned 32-bit, matching Determinism.portableHash
      ((bytes(0) & 0xffL) << 24) | ((bytes(1) & 0xffL) << 16) |
        ((bytes(2) & 0xffL) << 8) | (bytes(3) & 0xffL)
    }

    def nextUnit(): Double = nextLong().toDouble / Determinism.HashSpace.toDouble

    def nextInt(bound: Int): Int = (nextLong() % bound).toInt

    /** Fisher–Yates with rolls from this stream. */
    def shuffle[T](xs: Seq[T]): Seq[T] = {
      val arr = xs.toArray[Any]
      var i = arr.length - 1
      while (i > 0) {
        val j = nextInt(i + 1)
        val t = arr(i); arr(i) = arr(j); arr(j) = t
        i -= 1
      }
      arr.toSeq.asInstanceOf[Seq[T]]
    }
  }
}
