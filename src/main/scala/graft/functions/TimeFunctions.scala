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
    * the reference's emission format.
    *
    * The instant → wall-clock conversion is PINNED to UTC at the
    * expression (instant cast to TIMESTAMP_NTZ with an explicit zone,
    * then formatted zone-free): `date_format` alone renders in
    * spark.sql.session.timeZone, which would stamp a local wall-clock
    * next to the literal Z on any session built without Graft.tune. */
  def isoTimestamp(ms: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types.TimestampNTZType
    date_format(
      ColumnBridge.column(Cast(
        ColumnBridge.expression(timestamp_millis(ms)),
        TimestampNTZType, Some("UTC"))),
      "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
  }

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
