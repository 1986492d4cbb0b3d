package graft.sources

import java.time.LocalDate
import scala.util.Try

/** Folder-name date parsing
  * (reference: src/source/indexing/date_helpers.rs:6-95).
  *
  * Accepts `MM-DD-YYYY` / `YYYY-MM-DD` (with `-` or `_` separators), a year
  * folder plus `MM-DD[-YYYY]` (with optional `--SUFFIX` stripped), and
  * month-range folders like `Jan + Feb 2026` (last month token wins,
  * anchored to day 1).
  */
object DateHelpers {

  def parseFolderDate(folder: String): Option[LocalDate] = {
    val n = folder.replace('_', '-')
    parseMdy(n).orElse(parseYmd(n))
  }

  def parseYearFolderDate(yearStr: String, folder: String): Option[LocalDate] = {
    for {
      year <- Try(yearStr.trim.toInt).toOption
      core = folder.split("--").headOption.getOrElse(folder).trim
      n = core.replace('_', '-')
      d <- parseMdy(n).orElse(parseYmd(n)).orElse(parseMonthDay(n, year))
    } yield d
  }

  def parseMonthRangeFolder(yearStr: String, folder: String): Option[LocalDate] =
    for {
      year <- Try(yearStr.trim.toInt).toOption
      month <- folder.split("[^A-Za-z0-9]+").toSeq
        .filter(_.nonEmpty).map(_.toLowerCase)
        .flatMap(monthToNumber).lastOption
      d <- Try(LocalDate.of(year, month, 1)).toOption
    } yield d

  /** Best-effort date from a directory chain: try each dir standalone, then
    * (yearDir, dateDir) and month-range pairs. */
  def dateFromDirs(dirs: Seq[String]): Option[String] = {
    val standalone = dirs.flatMap(parseFolderDate)
    val paired = dirs.sliding(2).flatMap {
      case Seq(y, f) => parseYearFolderDate(y, f).orElse(parseMonthRangeFolder(y, f))
      case _ => None
    }.toSeq
    (standalone ++ paired).headOption.map(_.toString)
  }

  /** Common date renderings for metadata prefixes, sorted + deduped
    * (reference: src/metadata.rs:38-50 — ISO, "Oct. 15, 2024",
    * "October 15, 2024", "15.10.2024", "10/15/2024", "Oct 15, 2024"). */
  def dateMetaValues(date: LocalDate): Seq[String] = {
    import java.time.format.DateTimeFormatter
    import java.util.Locale
    def f(p: String) = DateTimeFormatter.ofPattern(p, Locale.US).format(date)
    Seq(
      f("yyyy-MM-dd"),
      s"${f("MMM")}. ${date.getDayOfMonth}, ${date.getYear}",
      s"${f("MMMM")} ${date.getDayOfMonth}, ${date.getYear}",
      f("dd.MM.yyyy"),
      f("MM/dd/yyyy"),
      s"${f("MMM")} ${date.getDayOfMonth}, ${date.getYear}"
    ).sorted.distinct
  }

  /** Column twin of [[dateMetaValues]]: the six renderings as a sorted,
    * deduped array column (pinned equal to the pure path in SourcesSpec —
    * q77 oracle-checks it cross-engine). */
  def dateMetaValuesColumn(d: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    def f(p: String) = date_format(d, p)
    array_sort(array_distinct(array(
      f("yyyy-MM-dd"),
      concat(f("MMM"), lit(". "), f("d"), lit(", "), f("yyyy")),
      concat(f("MMMM"), lit(" "), f("d"), lit(", "), f("yyyy")),
      f("dd.MM.yyyy"),
      f("MM/dd/yyyy"),
      concat(f("MMM"), lit(" "), f("d"), lit(", "), f("yyyy")))))
  }

  /** DuckDB mirror of [[dateMetaValuesColumn]] over a DATE expression. */
  def duckDateMetaValues(d: String): String = {
    def dayYear = s"CAST(day($d) AS VARCHAR) || ', ' || CAST(year($d) AS VARCHAR)"
    s"""list_sort(list_distinct([
      strftime($d, '%Y-%m-%d'),
      strftime($d, '%b') || '. ' || $dayYear,
      strftime($d, '%B') || ' ' || $dayYear,
      strftime($d, '%d.%m.%Y'),
      strftime($d, '%m/%d/%Y'),
      strftime($d, '%b') || ' ' || $dayYear]))"""
  }

  private def parseMdy(s: String): Option[LocalDate] = s.split('-') match {
    case Array(m, d, y) if y.length == 4 =>
      Try(LocalDate.of(y.toInt, m.toInt, d.toInt)).toOption
    case _ => None
  }

  private def parseYmd(s: String): Option[LocalDate] = s.split('-') match {
    case Array(y, m, d) if y.length == 4 =>
      Try(LocalDate.of(y.toInt, m.toInt, d.toInt)).toOption
    case _ => None
  }

  private def parseMonthDay(s: String, year: Int): Option[LocalDate] = s.split('-') match {
    case Array(m, d) =>
      for {
        mm <- Try(m.toInt).toOption if mm >= 1 && mm <= 12
        dd <- Try(d.toInt).toOption if dd >= 1 && dd <= 31
        date <- Try(LocalDate.of(year, mm, dd)).toOption
      } yield date
    case _ => None
  }

  private def monthToNumber(token: String): Option[Int] = token match {
    case "jan" | "january" => Some(1)
    case "feb" | "february" => Some(2)
    case "mar" | "march" => Some(3)
    case "apr" | "april" => Some(4)
    case "may" => Some(5)
    case "jun" | "june" => Some(6)
    case "jul" | "july" => Some(7)
    case "aug" | "august" => Some(8)
    case "sep" | "sept" | "september" => Some(9)
    case "oct" | "october" => Some(10)
    case "nov" | "november" => Some(11)
    case "dec" | "december" => Some(12)
    case _ => None
  }
}
