package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (suites execute in one
  * forked JVM; SparkSession is thread-safe for concurrent suites).
  */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local("graft-test", 4)
}
