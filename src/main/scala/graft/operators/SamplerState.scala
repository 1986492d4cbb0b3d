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
  /** Invalidate the persisted pool count after a source refresh (the pool
    * population changed): the next [[Sampler.nextBatch]] re-counts. */
  def refreshedPool: SamplerState = copy(counters = counters - "pool_size")
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

  /** Minimal single-pass scanner for exactly the shape [[toJson]] emits —
    * linear time and a lossless inverse of [[esc]] (a lossy or
    * backtracking-prone decode would silently change seeds/counter keys
    * on resume, shifting every downstream hash; the property suite hunts
    * this with adversarial strings). */
  def fromJson(json: String): Option[SamplerState] = Try {
    var i = 0
    def ws(): Unit = while (i < json.length && json.charAt(i).isWhitespace) i += 1
    def expect(s: String): Unit = {
      ws(); require(json.startsWith(s, i), s"expected '$s' at $i"); i += s.length
    }
    def parseString(): String = {
      ws(); require(json.charAt(i) == '"', s"expected string at $i"); i += 1
      val sb = new StringBuilder
      while (json.charAt(i) != '"') {
        val c = json.charAt(i)
        if (c == '\\') json.charAt(i + 1) match {
          case 'u' => sb.append(Integer.parseInt(json.substring(i + 2, i + 6), 16).toChar); i += 6
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case other => sb.append(other); i += 2
        }
        else { sb.append(c); i += 1 }
      }
      i += 1
      sb.toString
    }
    def parseLong(): Long = {
      ws(); val start = i
      if (json.charAt(i) == '-') i += 1
      while (i < json.length && json.charAt(i).isDigit) i += 1
      json.substring(start, i).toLong
    }
    expect("{"); expect("\"seed\""); expect(":")
    val seed = parseString()
    expect(","); expect("\"epoch\""); expect(":")
    val epoch = parseLong()
    expect(","); expect("\"counters\""); expect(":"); expect("{")
    val counters = Map.newBuilder[String, Long]
    ws()
    if (json.charAt(i) != '}') {
      var done = false
      while (!done) {
        val k = parseString(); expect(":")
        counters += (k -> parseLong())
        ws()
        if (i < json.length && json.charAt(i) == ',') i += 1 else done = true
      }
    }
    expect("}"); expect("}")
    SamplerState(seed, epoch, counters.result())
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

  /** Resume guard (reference file_store_rejects_seed_mismatch,
    * src/splits.rs tests): a persisted state whose seed differs from the
    * caller's configured seed must SURFACE, never silently win or lose —
    * a changed seed re-derives every split assignment and roll stream, so
    * resuming across seeds would contaminate eval splits and break every
    * golden sequence. Returns the state (or None for a fresh start) only
    * when the seeds agree. */
  def loadFor(path: String, expectedSeed: String): Either[String, Option[SamplerState]] =
    load(path) match {
      case None if !Files.exists(Paths.get(path)) => Right(None) // fresh start
      case None => Left( // file present but unparseable: never silently restart
        s"persisted sampler state at $path exists but does not parse — " +
          "refusing to restart from scratch over it (fix or delete the file)")
      case Some(st) if st.seed == expectedSeed => Right(Some(st))
      case Some(st) => Left(
        s"persisted sampler state at $path was built with seed '${st.seed}' " +
          s"but the caller configured '$expectedSeed' — refusing to resume " +
          "(a changed seed re-assigns splits and roll streams)")
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
