package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 is the coverage contract the library is graded
  * against — a registered query missing from its tables (or an
  * oracle claiming a query that doesn't exist) is a silent drift
  * between the documented and the real surface. Mechanical check,
  * same spirit as PlanLintSpec's stale-allowlist detection.
  */
class SurveyDriftSpec extends AnyFunSuite {

  private lazy val survey: String = {
    val src = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
    try src.mkString finally src.close()
  }

  /** Names in §2's tables only — a name surviving in §6 bench prose
    * must not mask a deleted coverage row. */
  private lazy val surveyNames: Set[String] = {
    val start = survey.indexOf("## §2")
    val end = survey.indexOf("## §3")
    assert(start >= 0 && end > start, "SURVEY.md §2/§3 headings moved")
    "\\|\\s*`([a-z0-9_]+)`\\s*\\|".r
      .findAllMatchIn(survey.substring(start, end)).map(_.group(1)).toSet
  }

  test("every registered query is documented in a SURVEY §2 row") {
    val undocumented = SparkEntry.queries.keySet -- surveyNames
    assert(undocumented.isEmpty,
      s"queries missing from SURVEY §2 tables: ${undocumented.toSeq.sorted}")
  }

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracleSql entries without a query: ${orphans.toSeq.sorted}")
  }

  test("§2 op ids are unique") {
    val start = survey.indexOf("## §2")
    val end = survey.indexOf("## §3")
    val ids = "(?m)^\\|\\s*([0-9]+[a-z'\"]*)\\s*\\|\\s*`".r
      .findAllMatchIn(survey.substring(start, end)).map(_.group(1)).toSeq
    val dups = ids.groupBy(identity).filter(_._2.length > 1).keys.toSeq
    assert(dups.isEmpty,
      s"duplicated SURVEY §2 op ids: ${dups.sorted.mkString(", ")}")
  }
}
