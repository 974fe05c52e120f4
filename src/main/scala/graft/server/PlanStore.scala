package graft.server

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** File-backed plan repository — the reference persists submitted plans and
  * their run history under an install directory
  * (`core/ui/plan/PlanRepository.scala` ~771 LoC of actor plumbing around
  * save/get/list/remove + execution records). The storage contract is the
  * part a headless engine needs; here it is one directory:
  *
  *   <dir>/<name>.plan   — the plan text as submitted (JSON or YAML)
  *   <dir>/_runs.jsonl   — append-only run history, one JSON line per run
  *
  * Names are restricted to `[A-Za-z0-9_-]` — the name is a filename, and
  * anything else would be a path-traversal hole in the REST surface.
  */
final class PlanStore(dir: String) {

  private val base: Path = Files.createDirectories(Paths.get(dir))
  private val runsFile: Path = base.resolve("_runs.jsonl")

  private def validName(name: String): Boolean =
    name.nonEmpty && name.length <= 128 && name.forall(c =>
      c.isLetterOrDigit && c <= 'z' || c == '_' || c == '-')

  private def planFile(name: String): Path = {
    require(validName(name), s"invalid plan name '$name' (use [A-Za-z0-9_-])")
    base.resolve(s"$name.plan")
  }

  /** Overwrite-or-create, ATOMICALLY: concurrent PUTs of the same name (the
    * REST executor is a thread pool) must each leave a complete document —
    * a plain truncate+write interleaving could leave a torn mix of two
    * bodies. Temp file + atomic move; last writer wins, wholly.
    */
  def save(name: String, text: String): Unit = {
    val target = planFile(name)
    val tmp = Files.createTempFile(base, s".$name", ".tmp")
    try {
      Files.writeString(tmp, text)
      Files.move(tmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } catch {
      // failed PUTs must not accumulate orphaned temp files in the store
      case e: Throwable => Files.deleteIfExists(tmp); throw e
    }
  }

  def get(name: String): Option[String] = {
    val f = planFile(name)
    // exists→read races with a concurrent DELETE; treat the vanish as absent
    try { if (Files.exists(f)) Some(Files.readString(f)) else None }
    catch { case _: java.nio.file.NoSuchFileException => None }
  }

  def list(): Seq[String] = {
    // Files.list holds an open DirectoryStream — close it, or every
    // GET /plans leaks one fd until the process ulimit
    val stream = Files.list(base)
    try stream.iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".plan"))
      .map(_.stripSuffix(".plan"))
      .toSeq.sorted
    finally stream.close()
  }

  def remove(name: String): Boolean =
    Files.deleteIfExists(planFile(name))

  /** Append one run record (caller supplies the timestamp so replays and
    * tests stay deterministic). */
  def recordRun(planName: String, runId: String, status: String,
      epochMs: Long, detail: String = ""): Unit = {
    def j(s: String) = graft.util.Jsons.quote(s)
    val line = s"""{"plan":${j(planName)},"id":${j(runId)},"status":${j(status)},""" +
      s""""ts":$epochMs,"detail":${j(detail)}}"""
    // one line per append, serialized: concurrent /run completions must not
    // interleave bytes within the history file
    synchronized {
      Files.writeString(runsFile, line + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  /** Raw history lines, oldest first. */
  def runs(): Seq[String] =
    if (!Files.exists(runsFile)) Nil
    else Files.readAllLines(runsFile).asScala.filter(_.nonEmpty).toSeq
}
