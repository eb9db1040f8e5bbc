package org.apache.spark

import org.apache.spark.rdd.RDD

/** Test-only accessor for the `private[spark]` local-checkpoint marker:
  * PlansSpec's eager-release sweep needs to distinguish an operator's own
  * localCheckpoint blocks (which legitimately back the returned frame)
  * from a leaked persisted intermediate. */
object GraftTestProbes {
  // bytecode-public but Scala-private[spark] via ScalaSig — reflect past it
  private val probe = classOf[RDD[_]].getMethod("isLocallyCheckpointed")
  def isLocallyCheckpointed(r: RDD[_]): Boolean =
    probe.invoke(r).asInstanceOf[Boolean]

  /** drain the async listener bus so a QueryExecutionListener's captures
    * are complete before a spec asserts on them */
  def flushListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
