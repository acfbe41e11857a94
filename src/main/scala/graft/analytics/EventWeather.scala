package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.enrich.WeatherEnrich
import graft.sources.Tables

/** Reference-parity surface (SURVEY.md §2.2-2.5) exercised over the
  * testbed's stream-shaped `events` table, per the FIXTURES.md mapping
  * convention: `props` (a JSON string) stands in for the Kafka payload
  * (`from_json` parity), `ts` → `timestamp_dt`, `event_type` → the
  * low-cardinality series key (city analog), `value` → the metric.
  *
  * The numeric mapping below is deterministic and expressible in both
  * Spark and ANSI SQL, so every query here is DuckDB-oracle-checkable:
  *   temperature_raw = value % 50   (fmod is exact on doubles)
  *   humidity        = props.k      (via from_json — S5 parity)
  *   wind_speed_num  = value % 60
  *   pressure        = 960 + user_id % 100   (straddles the 980/1040
  *                                            anomaly thresholds)
  *   weather_description = CASE over event_type (exercises E4's LIKE
  *                                               chain on each branch)
  *
  * The whole enrichment is narrow/map-only — no shuffle at any scale;
  * on a cluster it runs one codegen stage per input split.
  */
object EventWeather {

  /** The adapter: events → a frame with the reference cast-layer columns. */
  def weatherFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.withColumn("data",
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))) // S5: JSON parse
      .select(
        col("event_id"),
        col("event_type").as("city_name"),
        round(col("value") % 50.0).cast("int").as("temperature"),
        col("data.k").as("humidity"),
        (lit(960) + col("user_id") % 100).cast("int").as("pressure"),
        (col("value") % 60.0).as("wind_speed_num"),
        when(col("event_type") === "click", "clear sky")
          .when(col("event_type") === "error", "overcast clouds")
          .when(col("event_type") === "purchase", "light rain")
          .when(col("event_type") === "signup", "storm approaching")
          .when(col("event_type") === "view", "fog patches")
          .otherwise("unknown").as("weather_description"),
        col("ts").cast("long").as("epoch_s"))
      .withColumn("event_time", from_unixtime(col("epoch_s"))) // F8
      .withColumn("timestamp_dt", to_timestamp(col("event_time"))) // F9
  }

  /** Shared SQL prelude mirroring [[weatherFrame]] for the DuckDB oracle. */
  val weatherCte: String =
    """WITH w AS (
      |  SELECT event_id,
      |         event_type AS city_name,
      |         CAST(round(value % 50) AS INT) AS temperature,
      |         CAST(regexp_extract(props, '[0-9]+') AS INT) AS humidity,
      |         CAST(960 + user_id % 100 AS INT) AS pressure,
      |         value % 60 AS wind_speed_num,
      |         CASE event_type WHEN 'click' THEN 'clear sky'
      |                         WHEN 'error' THEN 'overcast clouds'
      |                         WHEN 'purchase' THEN 'light rain'
      |                         WHEN 'signup' THEN 'storm approaching'
      |                         WHEN 'view' THEN 'fog patches'
      |                         ELSE 'unknown' END AS weather_description,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
      |         strftime(make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000),
      |                  '%Y-%m-%d %H:%M:%S') AS event_time,
      |         make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000) AS timestamp_dt
      |  FROM events
      |), e AS (
      |  SELECT *,
      |    CAST(round(temperature - (100 - humidity) / 5) AS INT) AS dew_point,
      |    CASE WHEN temperature >= 27
      |         THEN CAST(round(temperature + 0.33 * humidity - 0.70 * wind_speed_num - 4.00) AS INT)
      |         ELSE temperature END AS heat_index,
      |    CASE WHEN temperature <= 10 AND wind_speed_num > 4.8
      |         THEN CAST(round(13.12 + 0.6215 * temperature
      |                         - 11.37 * pow(wind_speed_num, 0.16)
      |                         + 0.3965 * temperature * pow(wind_speed_num, 0.16)) AS INT)
      |         ELSE temperature END AS wind_chill,
      |    CASE WHEN weather_description LIKE '%clear%' THEN 'Clear'
      |         WHEN weather_description LIKE '%cloud%' THEN 'Cloudy'
      |         WHEN weather_description LIKE '%rain%' THEN 'Rainy'
      |         WHEN weather_description LIKE '%storm%' THEN 'Stormy'
      |         WHEN weather_description LIKE '%snow%' THEN 'Snowy'
      |         WHEN weather_description LIKE '%fog%' THEN 'Foggy'
      |         ELSE 'Other' END AS weather_category,
      |    CASE WHEN temperature BETWEEN 18 AND 24 AND humidity BETWEEN 30 AND 60 THEN 'Comfortable'
      |         WHEN temperature > 30 THEN 'Very Hot'
      |         WHEN temperature < 10 THEN 'Cold'
      |         WHEN humidity > 80 THEN 'Humid'
      |         ELSE 'Moderate' END AS comfort_level,
      |    CASE WHEN temperature > 40 OR temperature < 0 THEN true ELSE false END AS is_extreme_temp,
      |    CASE WHEN wind_speed_num > 50 THEN true ELSE false END AS is_high_wind,
      |    CASE WHEN pressure < 980 OR pressure > 1040 THEN true ELSE false END AS is_pressure_anomaly,
      |    CASE WHEN temperature > 40 OR temperature < 0 THEN 'EXTREME_TEMPERATURE'
      |         WHEN wind_speed_num > 50 THEN 'HIGH_WIND'
      |         WHEN pressure < 980 OR pressure > 1040 THEN 'PRESSURE_ANOMALY'
      |         ELSE 'NORMAL' END AS alert_type
      |  FROM w
      |)
      |""".stripMargin

  /** Enriched frame = adapter + E1-E7 (the reference's full DAG). */
  def enriched(spark: SparkSession, sfDir: String): DataFrame =
    WeatherEnrich.enrich(weatherFrame(spark, sfDir))

  private val enrichedCols = Seq(
    "event_id", "city_name", "temperature", "humidity", "pressure",
    "wind_speed_num", "event_time", "timestamp_dt", "dew_point", "heat_index",
    "wind_chill", "weather_category", "comfort_level", "is_extreme_temp",
    "is_high_wind", "is_pressure_anomaly", "alert_type")

  val defs: Seq[QueryDef] = Seq(
    // S5+S6+S7+E1-E7: the full enrichment pipeline (flagship parity query).
    QueryDef.sql("parity_enrich",
      weatherCte +
        s"SELECT ${enrichedCols.mkString(", ")} FROM e ORDER BY event_id") {
      (s, d) =>
        enriched(s, d)
          .select(enrichedCols.map(col): _*)
          .orderBy("event_id")
    },

    // S10+S9: alerts — non-NORMAL rows, Schema D projection.
    QueryDef.sql("parity_alerts",
      weatherCte +
        """SELECT event_id, timestamp_dt, city_name, alert_type, temperature,
          |       wind_speed_num, pressure
          |FROM e WHERE alert_type <> 'NORMAL' ORDER BY event_id""".stripMargin) {
      (s, d) =>
        enriched(s, d)
          .filter(col("alert_type") =!= "NORMAL")
          .select("event_id", "timestamp_dt", "city_name", "alert_type",
            "temperature", "wind_speed_num", "pressure")
          .orderBy("event_id")
    },

    // S8+O3: the 10-column console/debug projection, LIMIT 100.
    QueryDef.sql("parity_console",
      weatherCte +
        """SELECT event_id, timestamp_dt, city_name, temperature, humidity,
          |       pressure, heat_index, dew_point, wind_chill, comfort_level,
          |       alert_type
          |FROM e ORDER BY event_id LIMIT 100""".stripMargin) {
      (s, d) =>
        enriched(s, d)
          .select("event_id", "timestamp_dt", "city_name", "temperature",
            "humidity", "pressure", "heat_index", "dew_point", "wind_chill",
            "comfort_level", "alert_type")
          .orderBy("event_id")
          .limit(100)
    }
  )
}
