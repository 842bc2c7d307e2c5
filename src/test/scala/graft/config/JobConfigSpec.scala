package graft.config

import org.scalatest.funsuite.AnyFunSuite

class JobConfigSpec extends AnyFunSuite {

  // Reference format verbatim, including CRLF line endings
  // (/root/reference/configuration.properties:1-18).
  private val referenceText = Seq(
    "[Source]", "DBName:source", "Host:198.162.56.70", "Port:10001",
    "[Target]", "DBName:target", "Host:198.162.56.70", "Port:10001",
    "[Tables]", "emp", "dept", "salary", "student", "course", "marks",
    "[SampleDataPercentage]", "10", "[END]").mkString("\r\n") + "\r\n"

  test("parses the reference configuration.properties format") {
    val cfg = JobConfig.parse(referenceText)
    assert(cfg.source == Endpoint("source", "198.162.56.70", 10001))
    assert(cfg.target == Endpoint("target", "198.162.56.70", 10001))
    assert(cfg.tables == Seq("emp", "dept", "salary", "student", "course", "marks"))
    assert(cfg.sampleSize == 10)
    assert(cfg.sampleFraction == 0.1)
  }

  test("parses LF-only files and defaults missing sample size") {
    val cfg = JobConfig.parse(
      "[Source]\nDBName:s\n[Target]\nDBName:t\n[Tables]\na\n[END]\n")
    assert(cfg.source.dbName == "s")
    assert(cfg.tables == Seq("a"))
    assert(cfg.sampleSize == 10)
  }

  test("rejects a section with a malformed key line") {
    assertThrows[IllegalArgumentException] {
      JobConfig.parse("[Source]\nDBName\n[END]\n")
    }
  }
}
