package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Structured JSON-lines run log — the analogue of the reference's log-file
  * handler (ancillary.py:10-118: a per-run log with success/error counts
  * per granule). Each CLI command appends ONE line; fields are flat
  * key/value (strings escaped, numbers raw), so the log is both
  * greppable and loadable as a table (`spark.read.json`) for run audits.
  */
object RunLog {

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1f]", " ")

  def toJson(fields: Seq[(String, Any)]): String =
    fields.map {
      case (k, v: String) => s""""$k":"${esc(v)}""""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")

  /** Append one JSON line, creating parent directories as needed.
    * Synchronized: CLI commands may share a log file across threads. */
  def append(path: String, fields: Seq[(String, Any)]): Unit = synchronized {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.writeString(p, toJson(fields) + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
