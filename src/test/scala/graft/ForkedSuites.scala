package graft

/** JVM-global gate for the heavy forked-CHILD suites (r18): each of
  * ForkedProcessSpec / TwoProcessWalkSpec / StreamRaceSpec launches a
  * second JVM that storms the shared cross-process build lock for
  * minutes. Two lock-contending processes (this JVM + one child) is
  * the deployment shape the specs prove; under a parallel `sbt test`,
  * THREE-plus writers (this JVM + two children) can starve one
  * waiter past the 30 s acquire bound — a test-runner artifact, not
  * an engine defect (the lock is deliberately refuse-don't-race).
  * Suites that fork a long-lived storming child take this monitor
  * around their test body so at most ONE such child exists at a
  * time; the short-lived kill/hold forks don't need it.
  */
object ForkedSuites {
  val gate = new Object
}
