package graft.tools

import graft.GraftSession

/** Smoke-drive of the GraftSession front door: builds a session with
  * the graft extensions installed and exercises the injected SQL
  * functions end-to-end.
  *
  *   runMain graft.tools.SessionCheck
  */
object SessionCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val dot = spark.sql(
      "SELECT vector_dot_scaled(array(CAST(0.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(4.0 AS FLOAT), CAST(0.25 AS FLOAT))) AS d").head().getLong(0)
    val sim = spark.sql("SELECT simhash64(array('spark', 'engine')) AS s").head().getLong(0)
    // [nTokens, nDistinct, topCount, nBigrams, nDistinctBigrams]
    val rep = spark.sql("SELECT repetition_stats('a b a b a') AS r")
      .head().getSeq[Long](0)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    println(s"[session-check] dot=$dot sim=$sim rep=$rep aqe=$aqe " +
      s"ok=${dot == 2.5e14.toLong && sim > 0 && rep == Seq(5L, 2L, 3L, 4L, 2L) && aqe == "true"}")
    spark.stop()
  }
}
