package org.apache.spark.sql.hive.thriftserver

import org.apache.spark.sql.SQLContext

/** Test bridge: `HiveThriftServer2` (class and object) is
  * `private[hive]`, so the wire-surface spec starts/stops it through
  * this same-package shim. Returns the server as its public Hive
  * superclass, which carries `stop()`. */
object GraftThriftBridge {
  def start(sqlContext: SQLContext): org.apache.hive.service.server.HiveServer2 =
    HiveThriftServer2.startWithContext(sqlContext)
}
