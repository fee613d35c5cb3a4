package graft

class GraftSessionSpec extends GraftSpec {

  test("GraftSession registers native SQL functions via extensions") {
    // getOrCreate would silently reuse a pre-existing default session and
    // skip extension registration — clear it so the graft builder really
    // constructs the session (the SparkContext itself is still reused)
    val prior = org.apache.spark.sql.SparkSession.getDefaultSession
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = GraftSession.builder("local[2]", 2)
      .config("spark.ui.enabled", "false")
      .appName("graft-session-spec")
      .getOrCreate()
    try {
      val adler = s.sql("SELECT adler32(cast('Wikipedia' as binary)) AS a")
        .collect().head.getLong(0)
      assert(adler == 0x11E60398L)
      val fp = s.sql("SELECT rolling_fingerprint('the quick brown fox') AS f")
        .collect().head.getLong(0)
      assert(fp == graft.functions.RollingFingerprint
        .fingerprint("the quick brown fox".getBytes("UTF-8")))
      assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
    } finally {
      prior.foreach { p =>
        org.apache.spark.sql.SparkSession.setDefaultSession(p)
        org.apache.spark.sql.SparkSession.setActiveSession(p)
      }
    }
  }
}
