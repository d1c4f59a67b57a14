package graft

/** Tag for specs that run at sf0.1 (the driver's bench scale) — minutes,
  * not seconds. Included in the default suite (they are the regression
  * guard for scale-level claims); exclude locally with
  * `testOnly ... -- -l graft.SlowTest` when iterating.
  */
object SlowTest extends org.scalatest.Tag("graft.SlowTest")
