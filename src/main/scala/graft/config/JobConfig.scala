package graft.config

/** Job specification (SURVEY.md §2 S3).
  *
  * Parses the reference's sectioned key:value format
  * (`configuration.properties:1-18`): `[Source]`/`[Target]` sections with
  * `Key:Value` lines, a `[Tables]` section with one table name per line, a
  * single-value `[SampleDataPercentage]` section, and an `[END]` marker.
  * Lines use CRLF endings in the reference — the parser strips `\r`
  * (the reference does this with `sed "s/\r//g"`,
  * verizon_automation_script.sh:164-165).
  *
  * This is driver-side plain Scala — a job spec is a handful of strings,
  * not a DataFrame problem.
  */
final case class Endpoint(dbName: String, host: String, port: Int)

final case class JobConfig(
    source: Endpoint,
    target: Endpoint,
    tables: Seq[String],
    /** Named "percentage" in the reference but used as a row LIMIT
      * (verizon_automation_script.sh:220) — see SURVEY.md §7.4 #1. */
    sampleSize: Int) {
  def sampleFraction: Double = sampleSize / 100.0
}

object JobConfig {

  def parse(text: String): JobConfig = {
    val lines = text.split("\n").map(_.stripSuffix("\r").trim).filter(_.nonEmpty)
    val sections = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    var current: Option[String] = None
    lines.foreach {
      case l if l.startsWith("[") && l.endsWith("]") =>
        current = Some(l.substring(1, l.length - 1))
        if (current.get != "END") sections(current.get) = Vector.empty
      case l =>
        current match {
          case Some(s) if s != "END" => sections(s) = sections(s) :+ l
          case _ => // content before any section header: ignored, as the reference does
        }
    }

    def endpoint(name: String): Endpoint = {
      val kv = sections.getOrElse(name, Vector.empty)
        .map { l =>
          val i = l.indexOf(':')
          require(i > 0, s"malformed line in [$name]: $l")
          l.substring(0, i).trim -> l.substring(i + 1).trim
        }.toMap
      Endpoint(
        kv.getOrElse("DBName", sys.error(s"[$name] missing DBName")),
        kv.getOrElse("Host", ""),
        kv.get("Port").map(_.toInt).getOrElse(0))
    }

    JobConfig(
      source = endpoint("Source"),
      target = endpoint("Target"),
      tables = sections.getOrElse("Tables", Vector.empty),
      sampleSize = sections.getOrElse("SampleDataPercentage", Vector("10")).head.toInt)
  }

  def load(path: String): JobConfig =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
