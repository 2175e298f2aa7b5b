package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per JVM; sbt forks tests). */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.session

  /** Every message down a throwable's cause chain, newline-joined —
    * Spark wraps task failures several layers deep, so asserting on
    * the top-level message alone misses the real error.
    */
  protected def causeMessages(t: Throwable): String =
    Option(t).map(e => Option(e.getMessage).getOrElse("") + "\n" +
      causeMessages(e.getCause)).getOrElse("")

  override def afterAll(): Unit = super.afterAll()
}

object SparkTestBase {
  private lazy val tempWarehouse: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_warehouse")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      if (Files.exists(dir))
        Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
    }))
    dir.toString
  }

  lazy val session: SparkSession = {
    // Pin the model/stage store to a fresh per-JVM tempdir: the default
    // store under java.io.tmpdir OUTLIVES the JVM, so a second test run
    // would load staged text derivations the first run wrote and
    // plan-shape/timing expectations would depend on run history.
    // Suites that need their own cold store (the persistence specs)
    // still override the property around their bodies.
    if (!sys.props.contains("graft.model.dir")) {
      sys.props.put("graft.model.dir",
        java.nio.file.Files.createTempDirectory("graft_models_test").toString)
      ()
    }
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "org.apache.spark.sql.graftfns.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // managed tables (BucketedLayoutSpec) go to a temp warehouse,
      // not ./spark-warehouse inside the repo; deleted on JVM exit so
      // repeated test runs don't accumulate parquet in /tmp
      .config("spark.sql.warehouse.dir", tempWarehouse)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
