package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (Engine-configured so tests see the
  * same semantics as Verify/Bench: UTC, AQE, nanosAsLong). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session(master = "local[4]", shufflePartitions = 4)
  val sf = "/root/testdata/sf0.001"
}
