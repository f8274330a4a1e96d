package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time formatting helpers (SURVEY.md §2.8 X15, X16).
  *
  * Reference semantics: ports_scan.py:92-94 (+3 more apps) epoch-ms →
  * `%Y-%m-%dT%H:%M:%S.%03dZ`; ports_scan web controller :254-256
  * duration-ms → h:mm:ss divmod chain.
  */
object TimeFunctions {

  /** Epoch-ms → ISO8601 with milliseconds and a literal Z (UTC), exactly
    * the reference's emission format. */
  def isoTimestamp(ms: Column): Column =
    date_format(timestamp_millis(ms), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")

  /** Duration-ms → "h:mm:ss" (hours unpadded and unbounded — NOT a
    * time-of-day format, so > 24 h renders correctly). */
  def durationHms(ms: Column): Column = {
    val totalS = (ms / 1000).cast("long")
    concat_ws(":",
      (totalS / 3600).cast("long").cast("string"),
      lpad(((totalS % 3600) / 60).cast("long").cast("string"), 2, "0"),
      lpad((totalS % 60).cast("string"), 2, "0"))
  }
}
