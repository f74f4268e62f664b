package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, forked by sbt). */
object TestSpark {
  lazy val spark: SparkSession = Graft.localSession("graft-test", cores = 4)
  val sfDir = "/root/testdata/sf0.001"
  lazy val engine: Graft = Graft(spark, sfDir)
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = TestSpark.spark
  lazy val engine: Graft = TestSpark.engine
  def sfDir: String = TestSpark.sfDir
}
