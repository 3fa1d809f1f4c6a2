package graft

import org.scalatest.funsuite.AnyFunSuite

/** The COVERAGE.md crosswalk must never lag the query registry again
  * (r10 shipped q123 oracle-green but undocumented): every key in
  * `SparkEntry.queries` must be mentioned by its qNN number in
  * COVERAGE.md, and every oracle key must have a query. Pure
  * doc-vs-registry check — no Spark session. */
class CoverageSpec extends AnyFunSuite {

  test("every SparkEntry query appears in COVERAGE.md") {
    val cov = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")
    // qNN tokens present in the doc, tokenized so "q12" does not
    // satisfy "q123" (or vice versa)
    val mentioned = cov.toLowerCase.split("[^a-z0-9]+").toSet
      .filter(_.matches("q\\d+"))
    val missing = SparkEntry.queries.keys.toSeq
      .map(k => k -> k.takeWhile(_ != '_'))
      .filterNot { case (_, q) => mentioned.contains(q) }
      .sortBy(_._1)
    assert(missing.isEmpty,
      s"queries missing from COVERAGE.md: ${missing.map(_._1).mkString(", ")}")
  }

  test("every oracle key has a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
