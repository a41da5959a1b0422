package graft.ingest

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Processed-file manifest for incremental parsing
  * (`parsed_files.json`, reference parse.py:66-95): maps data type
  * ("blocks" / "txs") to the list of already-parsed raw file names.
  *
  * Lenient-load contract (parse.py:73-83): missing file, empty file, or
  * non-dict JSON all reset to an empty manifest.
  *
  * Note: the reference's `load_new_json` (parse.py:97-111) checks file
  * names against the manifest *dict's keys* rather than the per-type
  * list — a latent bug that makes its filter a no-op. We implement the
  * intended semantics (filter against the per-type list), which is what
  * gives the incremental pipeline exactly-once file processing.
  */
final class Manifest(directory: String) {
  private val path: Path = Paths.get(directory, "parsed_files.json")
  private val empty: Map[String, Seq[String]] =
    Map("blocks" -> Nil, "txs" -> Nil)

  def load(): Map[String, Seq[String]] = {
    val parsed = for {
      text <- Try(Files.readString(path)).toOption
      if text.nonEmpty
      json <- Try(JsonMethods.parse(text)).toOption
      obj <- json match {
        case JObject(fields) => Some(fields.toMap.map {
          case (k, JArray(vs)) => k -> vs.collect { case JString(s) => s }
          case (k, _)          => k -> Seq.empty[String]
        })
        case _ => None // non-dict content resets (parse.py:76-77)
      }
    } yield empty ++ obj
    parsed.getOrElse(empty)
  }

  /** Names in `candidates` not yet recorded under `dataType`. */
  def newFiles(candidates: Seq[String], dataType: String): Seq[String] = {
    val seen = load().getOrElse(dataType, Nil).toSet
    candidates.filterNot(seen)
  }

  /** Append names under `dataType` (parse.py:87-95). */
  def record(names: Seq[String], dataType: String): Unit = {
    val cur = load()
    save(cur + (dataType -> (cur.getOrElse(dataType, Nil) ++ names)))
  }

  /** Un-record names under `dataType` — the gap-fill refetch device:
    * when a refetched raw file's name collides with an already-parsed
    * one (only possible when the recorded parse landed nothing for the
    * refetched heights), forgetting the name makes the next parse()
    * consume the overwritten content. */
  def forget(names: Seq[String], dataType: String): Unit = {
    val drop = names.toSet
    val cur = load()
    save(cur + (dataType -> cur.getOrElse(dataType, Nil).filterNot(drop)))
  }

  private def save(updated: Map[String, Seq[String]]): Unit = {
    Files.createDirectories(path.getParent)
    val fields = updated.toSeq.sortBy(_._1).map { case (k, vs) =>
      s""""$k":[${vs.map(v => s""""$v"""").mkString(",")}]"""
    }
    Files.writeString(path, fields.mkString("{", ",", "}"))
  }
}
