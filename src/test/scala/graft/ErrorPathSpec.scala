package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Main, TransformSpecs}

/** Error-path fidelity matrix, mirroring the reference's
  * tests/test-parse-errors (each malformed transform file must FAIL with
  * a specific, useful diagnostic — pinned per input like the reference's
  * per-input expected text files) and tests/test-helpfulflags/test-helpfulflags.sh:5-12
  * (CLI misuse: no args fails pointing at help, --help prints usage,
  * unknown flags are clean errors). The first seven inputs are the
  * VERBATIM reference fixtures (tests/test-parse-errors/inputs), vendored
  * into src/test/resources/fixtures/parse-errors so the suite runs
  * without the reference checkout. */
class ErrorPathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixtureBytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/parse-errors/$name")
    require(in != null, s"missing vendored fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def tmpWith(name: String, bytes: Array[Byte]): String = {
    val d = Files.createTempDirectory("grafterr")
    val f = d.resolve(name)
    Files.write(f, bytes)
    f.toString
  }

  /** Load a transform file exactly like the CLI and return the failure
    * message (fails the test if it succeeds). */
  private def loadError(path: String): String = {
    val e = intercept[Exception] {
      Main.loadSpecs(Main.Config(transformFiles = Seq(path)))
    }
    assert(e.getMessage != null, s"no message from ${e.getClass}")
    e.getMessage
  }

  // ------------------------------------------------- reference fixtures

  /** (reference input, expected message fragments in OUR diagnostics) —
    * the analog of expected/<input>.txt. */
  private val parseMatrix: Seq[(String, Seq[String])] = Seq(
    "empty.ttl" -> Seq("RDF parser reported", "no Turtle statements"),
    "empty.xml" -> Seq("XML parser reported", "Premature end of file"),
    "invalid-turtle.ttl" -> Seq("defines no transforms"),
    "invalid-xml.xml" -> Seq("XML parser reported"),
    "valid-turtle-no-transform.ttl" ->
      Seq("valid RDF but defines no transforms"),
    "valid-xml-no-transform.xml" ->
      Seq("valid XML but defines no transform"),
    // garbage through the extensionless sniffing path: EVERY parser's
    // diagnosis is reported (expected/garbage.dat.txt pins both the RDF
    // and the XML reports)
    "garbage.dat" -> Seq("not a recognizable transform file",
      "RDF attempt", "XML attempt", "JSON attempt"))

  parseMatrix.foreach { case (input, fragments) =>
    test(s"parse-error fidelity: $input fails with a pinned diagnostic") {
      val local = tmpWith(input, fixtureBytes(input))
      val msg = loadError(local)
      fragments.foreach { frag =>
        assert(msg.contains(frag),
          s"$input: expected '$frag' in diagnostic:\n$msg")
      }
    }
  }

  test("parse-error fidelity: malformed JSON names the JSON parser") {
    val f = tmpWith("broken.json", "[{\"id\": \"x\",".getBytes)
    val msg = loadError(f)
    assert(msg.contains("JSON parser reported"), msg)
  }

  test("parse-error fidelity: JSON scalar is valid but defines no transforms") {
    val f = tmpWith("scalar.json", "42".getBytes)
    val msg = loadError(f)
    assert(msg.contains("valid JSON but defines no transforms"), msg)
  }

  // ------------------------------------------------------- CLI misuse

  test("helpfulflags: bare invocation is an error pointing at --help") {
    val e = intercept[IllegalArgumentException] { Main.parseArgs(Nil) }
    assert(e.getMessage.contains("--help"), e.getMessage)
  }

  test("helpfulflags: --help yields the usage text") {
    val c = Main.parseArgs(Seq("--help"))
    assert(c.help)
    assert(Main.usage.contains("--transforms"))
    assert(Main.usage.contains("usage:"))
  }

  test("helpfulflags: unknown flag is a clean error naming the flag") {
    val e = intercept[IllegalArgumentException] {
      Main.parseArgs(Seq("--frobnicate"))
    }
    assert(e.getMessage.contains("unknown argument: --frobnicate"),
      e.getMessage)
  }

  test("helpfulflags: missing --transforms fails with the require message") {
    val e = intercept[IllegalArgumentException] {
      Main.run(spark, Main.parseArgs(Seq(
        "--input", "/tmp/nonexistent-seqs",
        "--writer", "csv", "--output", "/tmp/nonexistent-out")))
    }
    assert(e.getMessage.contains("no transforms given"), e.getMessage)
  }

  test("helpfulflags: unknown writer / unknown summary are clean errors") {
    val ew = intercept[IllegalArgumentException] {
      TransformSpecs.skeleton("nope:plugin")
    }
    assert(ew.getMessage.contains("unknown plugin"), ew.getMessage)
    val es = intercept[IllegalArgumentException] {
      Main.parseArgs(Seq("--summaries", "meen"))
    }
    assert(es.getMessage.contains("unknown summary"), es.getMessage)
  }

  test("--segments-from with a missing file raises IOException (clean CLI exit)") {
    // main() catches IllegalArgumentException AND IOException for the
    // exit-2 "use --help" path; pin that this misuse is one of those
    val e = intercept[Exception] {
      Main.parseArgs(Seq("--segments-from", "/no/such/graft/file"))
    }
    assert(e.isInstanceOf[java.io.IOException], e.getClass.toString)
  }

  test("segment list: non-numeric field fails loudly (sloppy-parser rule)") {
    val e = intercept[IllegalArgumentException] {
      TransformSpecs.parseSegments("1.0\nbogus, 2.0\n")
    }
    assert(e.getMessage.contains("bad segment time: 'bogus'"), e.getMessage)
  }
}
