package graft.util

import org.apache.spark.sql.SparkSession

/** Child-session conf hygiene. `SparkSession.newSession()` starts from the
  * BASE SparkConf, not the parent's runtime session conf — semantic confs the
  * caller set via `conf.set` (ANSI mode, session timezone, codegen flags)
  * silently do not apply in the child. Every isolated-child-session site in
  * this library (BloomGate's cap-raised build, the control-plane tracker
  * session) must carry the parent's overrides across BEFORE applying its own
  * deliberate divergences. */
object SessionConfs {

  /** Copy every modifiable conf whose value differs from the child's current
    * value. Call before setting the child's own overrides, so those win. */
  def carryInto(parent: SparkSession, child: SparkSession): Unit =
    parent.conf.getAll.foreach { case (k, v) =>
      if (child.conf.isModifiable(k) && !child.conf.getOption(k).contains(v))
        child.conf.set(k, v)
    }
}
