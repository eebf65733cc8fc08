package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (suites execute in one
  * forked JVM; SparkSession is thread-safe for concurrent suites).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.local("graft-test", 4)
    // Pin the shared session to executor-local materialization so
    // IterateSpec's context-global setCheckpointDir can't flip
    // concurrently-running suites into reliable mode mid-test (the
    // production default — dir set ⇒ reliable — is itself under test
    // there, on its own newSession()).
    s.conf.set("spark.graft.checkpoint.reliable", "false")
    s
  }
}
