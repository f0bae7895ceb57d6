package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Generates the README's ScalaTest spec count from the suites themselves.
  *
  * The count is computed by INSTANTIATING every compiled Suite class and
  * summing `testNames.size` — ScalaTest registers tests at construction,
  * so loop-generated tests (e.g. TableSchemaSpec's per-table schema pins)
  * are counted exactly as `sbt test` will run them. A static grep of
  * `test("...")` undercounts those (189 vs 212 at the time of writing),
  * which is why the hand-maintained README number drifted in 3 of the
  * last 4 rounds.
  *
  * Lives in TEST scope (suite classes aren't visible from main), so the
  * sync entrypoint is `sbt "Test/runMain graft.SpecCatalog"`; SpecCountSpec
  * pins the committed README against the computed count.
  */
object SpecCatalog {

  /** The compiled test-code location of THIS class (not a hard-coded
    * `target/scala-2.13/...` path, which would silently break the
    * spec-count pin on a Scala version bump). Under `sbt test` this is
    * the test-classes DIRECTORY; under `sbt Test/runMain` sbt packages
    * the test classes into a bg-jobs JAR — both shapes are handled. */
  private val testCodeLocation: Path =
    Paths.get(SpecCatalog.getClass.getProtectionDomain
      .getCodeSource.getLocation.toURI)

  private def compiledClassNames(): Seq[String] = {
    val raw: Seq[String] =
      if (Files.isDirectory(testCodeLocation))
        scala.util.Using.resource(Files.walk(testCodeLocation)) { walk =>
          walk.iterator().asScala
            .map { p: Path => testCodeLocation.relativize(p).toString }
            .toSeq
        }
      else
        scala.util.Using.resource(
          new java.util.jar.JarFile(testCodeLocation.toFile)) { jar =>
          jar.entries().asScala.map(_.getName).toSeq
        }
    raw.filter(n => n.endsWith(".class") && !n.contains("$"))
      .map(_.stripSuffix(".class")
        .replace('/', '.').replace(java.io.File.separatorChar, '.'))
      .sorted
  }

  /** All top-level graft.*Spec suites on the compiled test classpath,
    * instantiated (cheap: construction only registers tests). */
  def discoverSuites(): Seq[org.scalatest.Suite] = {
    val names = compiledClassNames()
      .filter(_.matches("graft\\.[A-Za-z0-9]*Spec"))
    names.flatMap { n =>
      val cls = Class.forName(n)
      if (classOf[org.scalatest.Suite].isAssignableFrom(cls)
          && !java.lang.reflect.Modifier.isAbstract(cls.getModifiers))
        Some(cls.getDeclaredConstructor().newInstance()
          .asInstanceOf[org.scalatest.Suite])
      else None
    }
  }

  def specCount(): Int = discoverSuites().map(_.testNames.size).sum

  def readmeSpecLine(n: Int): String = s"**$n ScalaTest specs**"

  private val SpecsRe =
    "(?s)(<!-- specs:begin -->).*?(<!-- specs:end -->)".r

  /** README.md with the marked spec-count region replaced by the computed
    * number; identity when already in sync (spec-enforced). */
  def syncReadme(md: String, n: Int): String =
    SpecsRe.replaceAllIn(md, m => java.util.regex.Matcher.quoteReplacement(
      m.group(1) + readmeSpecLine(n) + m.group(2)))

  def main(args: Array[String]): Unit = {
    val n = specCount()
    val readme = Paths.get("README.md")
    Files.writeString(readme, syncReadme(Files.readString(readme), n))
    println(s"README spec count synced: $n")
  }
}
