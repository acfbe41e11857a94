package graft.schema

import org.apache.spark.sql.types._

/** The reference system's three data contracts, re-declared as Spark
  * `StructType`s (reference: spark-apps/weather_streaming.py:28-43 for
  * Schema A, :59-142 for Schema C, :185-192 for Schema D; see
  * /root/repo/SURVEY.md §1.2).
  *
  * Schema A is the Kafka wire contract: 14 fields, all strings (the
  * upstream builds JSON from flowfile attributes, which are inherently
  * strings). The accented French field names are part of the contract.
  */
object Schemas {

  /** Schema A — Kafka message contract (all StringType). */
  val schemaA: StructType = StructType(
    Seq(
      "date", "weather_description", "latitude", "pression", "humidité",
      "feels_like", "city_name", "local_time", "min_temp", "wind_speed",
      "température", "max_temp", "timestamp", "longitude"
    ).map(StructField(_, StringType, nullable = true))
  )

  /** Schema C — enriched output (25 fields; SURVEY.md §1.2 says "24" but
    * its own field table and the committed golden record both have 25).
    * Declared (never inferred)
    * so batch re-reads of the enriched store skip schema inference.
    */
  val schemaC: StructType = StructType(Seq(
    StructField("date", StringType),
    StructField("weather_description", StringType),
    StructField("city_name", StringType),
    StructField("local_time", StringType),
    StructField("timestamp", StringType),
    StructField("temperature", IntegerType),
    StructField("humidity", IntegerType),
    StructField("pressure", IntegerType),
    StructField("wind_speed_num", DoubleType),
    StructField("feels_like_num", IntegerType),
    StructField("min_temp_num", IntegerType),
    StructField("max_temp_num", IntegerType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("event_time", StringType),
    StructField("timestamp_dt", TimestampType),
    StructField("dew_point", IntegerType),
    StructField("heat_index", IntegerType),
    StructField("wind_chill", IntegerType),
    StructField("weather_category", StringType),
    StructField("comfort_level", StringType),
    StructField("is_extreme_temp", BooleanType),
    StructField("is_high_wind", BooleanType),
    StructField("is_pressure_anomaly", BooleanType),
    StructField("alert_type", StringType)
  ))

  /** Schema D — alerts projection (6 columns). */
  val alertColumns: Seq[String] = Seq(
    "timestamp_dt", "city_name", "alert_type",
    "temperature", "wind_speed_num", "pressure")
}

/** Typed row of the enriched output (Schema C) for `Dataset[Enriched]`
  * use — compile-time field checks where the schema is static.
  */
case class Enriched(
    date: String,
    weather_description: String,
    city_name: String,
    local_time: String,
    timestamp: String,
    temperature: Option[Int],
    humidity: Option[Int],
    pressure: Option[Int],
    wind_speed_num: Option[Double],
    feels_like_num: Option[Int],
    min_temp_num: Option[Int],
    max_temp_num: Option[Int],
    lat: Option[Double],
    lon: Option[Double],
    event_time: String,
    timestamp_dt: Option[java.sql.Timestamp],
    dew_point: Option[Int],
    heat_index: Option[Int],
    wind_chill: Option[Int],
    weather_category: String,
    comfort_level: String,
    is_extreme_temp: Boolean,
    is_high_wind: Boolean,
    is_pressure_anomaly: Boolean,
    alert_type: String)
