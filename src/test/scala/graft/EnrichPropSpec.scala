package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.enrich.WeatherEnrich
import org.apache.spark.sql.functions._

/** Property-based invariants of the enrichment operator set
  * (SURVEY.md §5.2), checked through the real Catalyst expressions on a
  * driver-built frame per sample batch. Uses scalacheck directly (the
  * scalatestplus bridge isn't in the offline cache).
  */
class EnrichPropSpec extends SparkSpec {
  import spark.implicits._

  private val sampleGen = Gen.listOfN(25, for {
    t <- Gen.chooseNum(-20.0, 60.0)
    h <- Gen.chooseNum(0, 100)
    w <- Gen.chooseNum(0.0, 80.0)
    p <- Gen.chooseNum(900, 1100)
  } yield (t, h, w, p))

  private def enrichAll(rows: List[(Double, Int, Double, Int)]) = {
    val df = rows.map { case (t, h, w, p) =>
      (t.toString, h.toString, w.toString, p.toString, "x")
    }.toDF("température", "humidité", "wind_speed", "pression", "weather_description")
      .withColumn("feels_like", lit("0")).withColumn("min_temp", lit("0"))
      .withColumn("max_temp", lit("0")).withColumn("latitude", lit("0"))
      .withColumn("longitude", lit("0")).withColumn("timestamp", lit("0"))
      .withColumn("date", lit("")).withColumn("city_name", lit(""))
      .withColumn("local_time", lit(""))
    WeatherEnrich.enrich(WeatherEnrich.castLayer(df)).collect()
  }

  private def check(name: String)(p: org.apache.spark.sql.Row => Boolean): Unit = {
    val prop = Prop.forAll(sampleGen) { rows =>
      rows.isEmpty || enrichAll(rows).forall(p)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("alert_type != NORMAL iff at least one anomaly flag is set") {
    check("alert-iff-flag") { r =>
      val anyFlag = r.getAs[Boolean]("is_extreme_temp") ||
        r.getAs[Boolean]("is_high_wind") || r.getAs[Boolean]("is_pressure_anomaly")
      (r.getAs[String]("alert_type") != "NORMAL") == anyFlag
    }
  }

  test("heat_index/wind_chill are passthrough outside their gates") {
    check("gated-passthrough") { r =>
      val t = r.getAs[Int]("temperature")
      val w = r.getAs[Double]("wind_speed_num")
      (t >= 27 || r.getAs[Int]("heat_index") == t) &&
      ((t <= 10 && w > 4.8) || r.getAs[Int]("wind_chill") == t)
    }
  }

  test("comfort_level Comfortable implies the conjunctive window held") {
    check("comfortable-window") { r =>
      r.getAs[String]("comfort_level") != "Comfortable" || {
        val t = r.getAs[Int]("temperature"); val h = r.getAs[Int]("humidity")
        t >= 18 && t <= 24 && h >= 30 && h <= 60
      }
    }
  }
}
