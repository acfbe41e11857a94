package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.enrich.WeatherEnrich

/** E1-E7 + cast-layer semantics against the reference's committed golden
  * record and formula boundary values (SURVEY.md §5; FIXTURES.md F1-F2).
  */
class EnrichSpec extends SparkSpec {
  import spark.implicits._

  private val goldenJson = Fixtures.goldenJson

  test("golden record reproduces the reference's committed output byte-for-byte") {
    val out = WeatherEnrich.pipeline(Seq(goldenJson).toDF("value")).first()
    def g[T](c: String): T = out.getAs[T](c)
    assert(g[Int]("temperature") == 23)
    assert(g[Int]("humidity") == 69)
    assert(g[Int]("pressure") == 1014)
    assert(g[Double]("wind_speed_num") == 5.14)
    assert(g[Int]("feels_like_num") == 23)
    assert(g[Int]("min_temp_num") == 23)
    assert(g[Int]("max_temp_num") == 23)
    assert(g[Double]("lat") == 33.5928 && g[Double]("lon") == -7.6192)
    assert(g[String]("event_time") == "2025-10-28 14:31:46") // UTC pinned
    assert(g[java.sql.Timestamp]("timestamp_dt").toInstant.toString ==
      "2025-10-28T14:31:46Z")
    assert(g[Int]("dew_point") == 17) // round(23 - (100-69)/5)
    assert(g[Int]("heat_index") == 23) // T < 27 => passthrough
    assert(g[Int]("wind_chill") == 23) // T > 10 => passthrough
    assert(g[String]("weather_category") == "Cloudy")
    assert(g[String]("comfort_level") == "Moderate") // H=69 > 60 kills Comfortable
    assert(!g[Boolean]("is_extreme_temp") && !g[Boolean]("is_high_wind") &&
      !g[Boolean]("is_pressure_anomaly"))
    assert(g[String]("alert_type") == "NORMAL")
  }

  private def enrichRow(t: Any, h: Any, w: Any, p: Any, desc: String = "x"): Row = {
    val df = Seq((t.toString, h.toString, w.toString, p.toString, desc))
      .toDF("température", "humidité", "wind_speed", "pression", "weather_description")
      .withColumn("feels_like", lit("0")).withColumn("min_temp", lit("0"))
      .withColumn("max_temp", lit("0")).withColumn("latitude", lit("0"))
      .withColumn("longitude", lit("0")).withColumn("timestamp", lit("0"))
      .withColumn("date", lit("")).withColumn("city_name", lit(""))
      .withColumn("local_time", lit(""))
    WeatherEnrich.enrich(WeatherEnrich.castLayer(df)).first()
  }

  test("heat index boundary: applies at exactly T=27, passthrough below") {
    assert(enrichRow(27, 50, 0, 1000).getAs[Int]("heat_index") ==
      math.round(27 + 0.33 * 50 - 4.0).toInt)
    assert(enrichRow(26.4, 50, 0, 1000).getAs[Int]("heat_index") == 26)
  }

  test("wind chill boundary: needs T<=10 AND W>4.8") {
    val r = enrichRow(5, 50, 10.0, 1000)
    val expected = math.round(13.12 + 0.6215 * 5 - 11.37 * math.pow(10, 0.16) +
      0.3965 * 5 * math.pow(10, 0.16)).toInt
    assert(r.getAs[Int]("wind_chill") == expected)
    assert(enrichRow(5, 50, 4.8, 1000).getAs[Int]("wind_chill") == 5) // W not > 4.8
    assert(enrichRow(11, 50, 10.0, 1000).getAs[Int]("wind_chill") == 11) // T not <= 10
  }

  test("category precedence: first LIKE match wins (clear before cloud)") {
    assert(enrichRow(20, 50, 0, 1000, "clear with clouds")
      .getAs[String]("weather_category") == "Clear")
    assert(enrichRow(20, 50, 0, 1000, "snow storm")
      .getAs[String]("weather_category") == "Stormy")
    assert(enrichRow(20, 50, 0, 1000, "CLEAR").getAs[String]("weather_category") ==
      "Other") // case-sensitive LIKE
  }

  test("comfort level: conjunctive window then priority chain") {
    assert(enrichRow(20, 45, 0, 1000).getAs[String]("comfort_level") == "Comfortable")
    assert(enrichRow(20, 61, 0, 1000).getAs[String]("comfort_level") == "Moderate")
    assert(enrichRow(31, 45, 0, 1000).getAs[String]("comfort_level") == "Very Hot")
    assert(enrichRow(9, 85, 0, 1000).getAs[String]("comfort_level") == "Cold") // T<10 before H>80
  }

  test("alert priority: extreme temp > high wind > pressure anomaly") {
    assert(enrichRow(41, 50, 60, 900).getAs[String]("alert_type") == "EXTREME_TEMPERATURE")
    assert(enrichRow(20, 50, 60, 900).getAs[String]("alert_type") == "HIGH_WIND")
    assert(enrichRow(20, 50, 10, 900).getAs[String]("alert_type") == "PRESSURE_ANOMALY")
    assert(enrichRow(20, 50, 10, 1000).getAs[String]("alert_type") == "NORMAL")
    assert(enrichRow(-1, 50, 10, 1000).getAs[String]("alert_type") == "EXTREME_TEMPERATURE")
  }

  test("invalid numeric strings cast to null and fall through otherwise branches") {
    val r = enrichRow("not-a-number", "n/a", "bad", "oops")
    assert(r.isNullAt(r.fieldIndex("temperature")))
    assert(r.isNullAt(r.fieldIndex("dew_point"))) // null arithmetic => null
    assert(r.getAs[String]("comfort_level") == "Moderate") // all comparisons null => otherwise
    assert(!r.getAs[Boolean]("is_extreme_temp"))
    assert(r.getAs[String]("alert_type") == "NORMAL")
  }

  test("round-vs-truncate asymmetry: temps round, humidity/pressure truncate") {
    val r = enrichRow(22.97, 69.9, 0, 1013.9)
    assert(r.getAs[Int]("temperature") == 23) // rounds
    assert(r.getAs[Int]("humidity") == 69) // truncates
    assert(r.getAs[Int]("pressure") == 1013) // truncates
  }
}
