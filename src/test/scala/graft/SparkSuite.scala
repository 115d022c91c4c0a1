package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (getOrCreate reuses one JVM-wide
  * session; suites must not stop() it). Mirrors the Verify/Bench builder —
  * notably the UTC zone + parquet timestamp configs the events loader
  * depends on (see [[graft.Sessions]] / [[graft.Tables]]). */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = Sessions.local("4", appName = "graft-test")

  /** Override with GRAFT_TEST_SF_DIR to run every suite invariant at a
    * larger scale factor (e.g. sf0.01 = 10× the default). */
  val sfDir = sys.env.getOrElse("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
}
