package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session, ScalaTest
  * runs suites sequentially in one forked JVM per `build.sbt`). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = Sessions.local("4")
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

abstract class SparkSpec extends AnyFunSuite {
  protected def spark: SparkSession = SparkSpec.spark
  protected def sf: String = SparkSpec.sf
}
