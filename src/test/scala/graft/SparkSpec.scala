package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for specs (one per suite, lazy). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    // keep catalog state (warehouse + derby metastore) out of the repo;
    // static confs, so they must be set by whichever suite builds the
    // shared session first — this trait is the only builder.
    val scratch = java.nio.file.Files.createTempDirectory("graft-spark").toString
    System.setProperty("derby.system.home", scratch)
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$scratch/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  val sf = "/root/testdata/sf0.001"
}
