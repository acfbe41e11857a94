package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.schema.Schemas

/** The reference's enrichment operator set (SURVEY.md §2.5 E1-E7 and the
  * cast layer S6-S7), re-expressed as pure `Column` builders — plain
  * Catalyst expression trees, no UDFs, identical in batch and streaming,
  * fully inside whole-stage codegen.
  *
  * Semantics preserved bit-for-bit from the reference
  * (spark-apps/weather_streaming.py):
  *  - temperature family is round-then-cast (:62,66-68); humidity and
  *    pressure are truncating double→int casts, no round (:63-64);
  *  - all formulas round HALF_UP to 0 decimals then cast int;
  *  - every CASE chain is order-sensitive (first match wins);
  *  - comparisons on null inputs fall through to the `otherwise` branch.
  */
object WeatherEnrich {

  // ---- E1-E3: derived meteorology ------------------------------------

  /** E1 dew point: round(T − (100−H)/5) as int (weather_streaming.py:81-84). */
  def dewPoint(t: Column, h: Column): Column =
    round(t - ((lit(100) - h) / 5)).cast("int")

  /** E2 heat index: T ≥ 27 ? round(T + 0.33H − 0.70W − 4.00) : T
    * (weather_streaming.py:87-92).
    */
  def heatIndex(t: Column, h: Column, w: Column): Column =
    when(t >= 27,
      round(t + lit(0.33) * h - lit(0.70) * w - lit(4.00)).cast("int"))
      .otherwise(t)

  /** E3 wind chill: (T ≤ 10 AND W > 4.8) ?
    * round(13.12 + 0.6215T − 11.37·W^0.16 + 0.3965·T·W^0.16) : T
    * (weather_streaming.py:95-102).
    */
  def windChill(t: Column, w: Column): Column =
    when((t <= 10) && (w > 4.8),
      round(lit(13.12) + lit(0.6215) * t -
        lit(11.37) * pow(w, 0.16) +
        lit(0.3965) * t * pow(w, 0.16)).cast("int"))
      .otherwise(t)

  // ---- E4-E5: categorical classification -----------------------------

  /** E4 weather category: ordered LIKE chain, first match wins
    * (weather_streaming.py:105-114).
    */
  def weatherCategory(desc: Column): Column =
    when(desc.like("%clear%"), "Clear")
      .when(desc.like("%cloud%"), "Cloudy")
      .when(desc.like("%rain%"), "Rainy")
      .when(desc.like("%storm%"), "Stormy")
      .when(desc.like("%snow%"), "Snowy")
      .when(desc.like("%fog%"), "Foggy")
      .otherwise("Other")

  /** E5 comfort level (weather_streaming.py:117-124). */
  def comfortLevel(t: Column, h: Column): Column =
    when(t.between(18, 24) && h.between(30, 60), "Comfortable")
      .when(t > 30, "Very Hot")
      .when(t < 10, "Cold")
      .when(h > 80, "Humid")
      .otherwise("Moderate")

  // ---- E6-E7: anomaly flags + alert priority -------------------------

  /** E6 flags (weather_streaming.py:127-136). */
  def isExtremeTemp(t: Column): Column =
    when((t > 40) || (t < 0), true).otherwise(false)
  def isHighWind(w: Column): Column =
    when(w > 50, true).otherwise(false)
  def isPressureAnomaly(p: Column): Column =
    when((p < 980) || (p > 1040), true).otherwise(false)

  /** E7 alert priority: EXTREME_TEMPERATURE > HIGH_WIND >
    * PRESSURE_ANOMALY > NORMAL (weather_streaming.py:136-142).
    */
  def alertType(extreme: Column, highWind: Column, pAnomaly: Column): Column =
    when(extreme, "EXTREME_TEMPERATURE")
      .when(highWind, "HIGH_WIND")
      .when(pAnomaly, "PRESSURE_ANOMALY")
      .otherwise("NORMAL")

  // ---- S5-S7: parse + cast layer -------------------------------------

  /** S5: parse a JSON `value` column against Schema A and expand the
    * struct (weather_streaming.py:59-61). Malformed JSON yields an
    * all-null row (PERMISSIVE).
    */
  def parseKafkaValue(df: DataFrame): DataFrame =
    df.select(from_json(col("value").cast("string"), Schemas.schemaA).alias("data"))
      .select("data.*")

  /** S6+S7: the cast/rename layer (weather_streaming.py:62-74).
    * Temperature family rounds before the int cast; humidity/pressure
    * truncate; epoch-seconds string → `event_time` string and
    * `timestamp_dt` timestamp (session TZ pinned UTC).
    */
  def castLayer(df: DataFrame): DataFrame =
    df.withColumn("temperature", round(col("température").cast("double")).cast("int"))
      .withColumn("humidity", col("humidité").cast("double").cast("int"))
      .withColumn("pressure", col("pression").cast("double").cast("int"))
      .withColumn("wind_speed_num", col("wind_speed").cast("double"))
      .withColumn("feels_like_num", round(col("feels_like").cast("double")).cast("int"))
      .withColumn("min_temp_num", round(col("min_temp").cast("double")).cast("int"))
      .withColumn("max_temp_num", round(col("max_temp").cast("double")).cast("int"))
      .withColumn("lat", col("latitude").cast("double"))
      .withColumn("lon", col("longitude").cast("double"))
      .withColumn("event_time", from_unixtime(col("timestamp").cast("long")))
      .withColumn("timestamp_dt", to_timestamp(col("event_time")))
      .drop("température", "humidité", "pression", "feels_like", "min_temp",
        "max_temp", "latitude", "longitude", "wind_speed")

  /** E1-E7 applied over a frame that already has the cast-layer columns
    * (`temperature`, `humidity`, `pressure`, `wind_speed_num`,
    * `weather_description`). Narrow, map-only — Catalyst collapses the
    * projections into a single codegen stage regardless of data size.
    */
  def enrich(df: DataFrame): DataFrame =
    df.withColumn("dew_point", dewPoint(col("temperature"), col("humidity")))
      .withColumn("heat_index",
        heatIndex(col("temperature"), col("humidity"), col("wind_speed_num")))
      .withColumn("wind_chill", windChill(col("temperature"), col("wind_speed_num")))
      .withColumn("weather_category", weatherCategory(col("weather_description")))
      .withColumn("comfort_level", comfortLevel(col("temperature"), col("humidity")))
      .withColumn("is_extreme_temp", isExtremeTemp(col("temperature")))
      .withColumn("is_high_wind", isHighWind(col("wind_speed_num")))
      .withColumn("is_pressure_anomaly", isPressureAnomaly(col("pressure")))
      .withColumn("alert_type",
        alertType(col("is_extreme_temp"), col("is_high_wind"), col("is_pressure_anomaly")))

  /** Full pipeline from a raw Kafka-shaped frame (binary/string `value`
    * column): parse → cast → enrich. Works identically on batch and
    * streaming DataFrames.
    */
  def pipeline(raw: DataFrame): DataFrame =
    enrich(castLayer(parseKafkaValue(raw)))

  /** S10+S9: the alerts stream — non-NORMAL rows, Schema D projection
    * (weather_streaming.py:183-192).
    */
  def alerts(enriched: DataFrame): DataFrame =
    enriched.filter(col("alert_type") =!= "NORMAL")
      .select(Schemas.alertColumns.map(col): _*)

  /** S8: the 10-column console/debug projection (weather_streaming.py:149-160). */
  def consoleProjection(enriched: DataFrame): DataFrame =
    enriched.select("timestamp_dt", "city_name", "temperature", "humidity",
      "pressure", "heat_index", "dew_point", "wind_chill", "comfort_level",
      "alert_type")
}
