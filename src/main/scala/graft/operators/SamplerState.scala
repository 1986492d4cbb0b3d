package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.util.Try

/** Restart-resume persistence.
  *
  * Because every sampling choice in this engine is a pure function of
  * `(seed, epoch, id, draw counter)`, resumable state is just the counters
  * — the distributed analogue of the reference's `PersistedSamplerState`
  * (reference: src/splits.rs:100-117, save/load src/sampler/mod.rs:570-617),
  * which persists cycle indices, cursors, and RNG words but never data.
  *
  * Files are written temp-then-publish (atomic rename), mirroring
  * `FileSplitStore`'s never-partially-written contract
  * (reference: src/splits.rs:571-611). The format is a flat,
  * dependency-free JSON object.
  */
case class SamplerState(
    seed: String,
    epoch: Long,
    counters: Map[String, Long]) {
  def advanced(key: String, by: Long = 1L): SamplerState =
    copy(counters = counters.updated(key, counters.getOrElse(key, 0L) + by))
  def counter(key: String): Long = counters.getOrElse(key, 0L)
}

object SamplerState {

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def toJson(st: SamplerState): String = {
    val counters = st.counters.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": $v""" }.mkString(", ")
    s"""{"seed": "${esc(st.seed)}", "epoch": ${st.epoch}, "counters": {$counters}}"""
  }

  /** Exact inverse of [[esc]]: decodes \uXXXX (control chars), \" and \\.
    * A lossy decode here would silently change seeds/counter keys on
    * resume, shifting every downstream hash. */
  private def unesc(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) s.charAt(i + 1) match {
        case 'u' if i + 5 < s.length =>
          sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
        case '"' => sb.append('"'); i += 2
        case '\\' => sb.append('\\'); i += 2
        case other => sb.append(other); i += 2
      }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Minimal parser for exactly the shape [[toJson]] emits. */
  def fromJson(json: String): Option[SamplerState] = Try {
    val seed = unesc(""""seed":\s*"((?:[^"\\]|\\.)*)"""".r
      .findFirstMatchIn(json).get.group(1))
    val epoch = """"epoch":\s*(-?\d+)""".r.findFirstMatchIn(json).get.group(1).toLong
    // escape-aware body match: quoted keys may contain '}' — consume
    // string literals atomically so the brace scan cannot end early
    val body = """"counters":\s*\{((?:"(?:[^"\\]|\\.)*"|[^}"])*)\}""".r
      .findFirstMatchIn(json).get.group(1)
    val counters = """"((?:[^"\\]|\\.)*)":\s*(-?\d+)""".r.findAllMatchIn(body)
      .map(m => unesc(m.group(1)) -> m.group(2).toLong)
      .toMap
    SamplerState(seed, epoch, counters)
  }.toOption

  /** Temp-then-publish save; the target path is never partially written. */
  def save(st: SamplerState, path: String): Unit = {
    val target = Paths.get(path)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    val tmp: Path = Paths.get(path + ".tmp")
    Files.writeString(tmp, toJson(st))
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  def load(path: String): Option[SamplerState] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) None
    else fromJson(Files.readString(p))
  }
}

/** Exhaustion-retry driver loop (reference: src/sampler/mod.rs:2846-2909):
  * a batch producer that comes up empty triggers up to [[RetryLimit]]
  * forced source refreshes before the exhaustion surfaces as an error —
  * the Spark-native analogue of `force_ingest_refresh` + retry around the
  * three `next_*_batch` entry points. */
object Exhaustion {

  /** reference EXHAUSTION_RETRY_LIMIT (src/constants.rs:81). */
  val RetryLimit = 2

  final case class Exhausted(label: String)
    extends RuntimeException(s"sampler exhausted: $label")

  /** Run `attempt` up to `retryLimit + 1` times, invoking `refresh`
    * between failed attempts (but not after the last). */
  def withRetry[T](label: String, retryLimit: Int = RetryLimit)(
      attempt: () => Option[T])(refresh: () => Unit): T = {
    var i = 0
    while (i <= retryLimit) {
      attempt() match {
        case Some(t) => return t
        case None => if (i < retryLimit) refresh()
      }
      i += 1
    }
    throw Exhausted(label)
  }
}
