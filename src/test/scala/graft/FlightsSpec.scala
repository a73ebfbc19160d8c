package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.domain.Flights

/** End-to-end spec for the reference's concrete flight domain: CSV fixtures
  * shaped like the 2015 US DOT data → bronze → dims → fact → gold. */
class FlightsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("4", "graft-flights-test")
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_flights_").toString
    val flightCols = Flights.flightsSchema.fieldNames
    def flightRow(m: Map[String, String]): String =
      flightCols.map(c => m.getOrElse(c, "")).mkString(",")
    val flights = Seq(
      Map("year" -> "2015", "month" -> "1", "day" -> "1", "airline" -> "AA",
        "flight_number" -> "100", "tail_number" -> "N1", "origin_airport" -> "JFK",
        "destination_airport" -> "LAX", "departure_delay" -> "5",
        "arrival_delay" -> "20", "distance" -> "2475", "cancelled" -> "0",
        "diverted" -> "0"),
      Map("year" -> "2015", "month" -> "1", "day" -> "1", "airline" -> "AA",
        "flight_number" -> "100", "tail_number" -> "N1", "origin_airport" -> "JFK",
        "destination_airport" -> "LAX", "departure_delay" -> "5",
        "arrival_delay" -> "20", "distance" -> "2475", "cancelled" -> "0",
        "diverted" -> "0"), // exact duplicate natural key → dedup to 1
      Map("year" -> "2015", "month" -> "1", "day" -> "2", "airline" -> "UA",
        "flight_number" -> "200", "tail_number" -> "N2", "origin_airport" -> "LAX",
        "destination_airport" -> "SFO", "departure_delay" -> "-3",
        "arrival_delay" -> "0", "distance" -> "337", "cancelled" -> "0",
        "diverted" -> "0"),
      Map("year" -> "2015", "month" -> "1", "day" -> "2", "airline" -> "UA",
        "flight_number" -> "201", "tail_number" -> "N2", "origin_airport" -> "SFO",
        "destination_airport" -> "SFO", "arrival_delay" -> "99",
        "distance" -> "0", "cancelled" -> "0", "diverted" -> "0"), // origin==dest → filtered
      Map("year" -> "2015", "month" -> "1", "day" -> "2", "airline" -> "XX",
        "flight_number" -> "300", "origin_airport" -> "JFK",
        "destination_airport" -> "SFO", "arrival_delay" -> "30",
        "cancelled" -> "1", "diverted" -> "0")) // unknown airline → inner-join drop
    Files.writeString(Paths.get(s"$d/flights.csv"),
      (flightCols.mkString(",") +: flights.map(flightRow)).mkString("\n"))
    Files.writeString(Paths.get(s"$d/airlines.csv"),
      "iata_code,airline\nAA,American Airlines\nUA,United Airlines\n")
    Files.writeString(Paths.get(s"$d/airports.csv"),
      "iata_code,airport,city,state,country,latitude,longitude\n" +
        "JFK,Kennedy,New York,NY,USA,40.64,-73.78\n" +
        "LAX,Los Angeles Intl,Los Angeles,CA,USA,33.94,-118.41\n" +
        "SFO,San Francisco Intl,San Francisco,CA,USA,37.62,-122.38\n")
    d
  }

  test("schemas match the reference column inventory") {
    assert(Flights.flightsSchema.size == 31)
    assert(Flights.airlinesSchema.fieldNames.toSeq == Seq("iata_code", "airline"))
    assert(Flights.airportsSchema.size == 7)
  }

  test("full medallion pipeline: bronze → dims → fact → gold") {
    val wh = Files.createTempDirectory("graft_flights_wh_").toString
    val gold = Flights.runPipeline(spark, s"$dir/flights.csv",
      s"$dir/airlines.csv", s"$dir/airports.csv", wh)
    val rows = gold.collect()
    // 5 input flights: 1 dup removed, 1 origin==dest removed, 1 unknown
    // airline dropped by the inner dim join → 2 fact rows on 2 days
    assert(rows.length == 2)
    val day1 = rows(0)
    assert(day1.getAs[Long]("total_flights") == 1L)
    assert(day1.getAs[Double]("avg_arrival_delay") == 20.0)
    assert(day1.getAs[Double]("delay_rate") == 100.0)
    // partitioned silver + gold landed in the warehouse
    assert(new java.io.File(s"$wh/fact_flight").listFiles()
      .exists(_.getName.startsWith("p_date=")))
    assert(new java.io.File(s"$wh/daily_flight_summary").exists())
  }

  test("fact: day_of_week uses the Monday=1 convention") {
    val fact = Flights.factFlight(
      Flights.bronzeIngest(spark, s"$dir/flights.csv", Flights.flightsSchema,
        "p", "r", "t"),
      Flights.dimDate(spark),
      Flights.dimAirline(Flights.bronzeIngest(spark, s"$dir/airlines.csv",
        Flights.airlinesSchema, "p", "r", "t")),
      Flights.dimAirport(Flights.bronzeIngest(spark, s"$dir/airports.csv",
        Flights.airportsSchema, "p", "r", "t")))
    val dows = fact.select("flight_date", "day_of_week").distinct().collect()
      .map(r => r.getDate(0).toString -> r.getInt(1)).toMap
    assert(dows("2015-01-01") == 4) // Thursday
    assert(dows("2015-01-02") == 5) // Friday
  }

  test("gold: airline performance, route analytics, delay buckets") {
    val airlines = Flights.dimAirline(Flights.bronzeIngest(spark,
      s"$dir/airlines.csv", Flights.airlinesSchema, "p", "r", "t"))
    val airports = Flights.dimAirport(Flights.bronzeIngest(spark,
      s"$dir/airports.csv", Flights.airportsSchema, "p", "r", "t"))
    val fact = Flights.factFlight(
      Flights.bronzeIngest(spark, s"$dir/flights.csv", Flights.flightsSchema,
        "p", "r", "t"),
      Flights.dimDate(spark), airlines, airports)

    val perf = Flights.goldAirlinePerformance(fact, airlines).collect()
    assert(perf.length == 2)
    val aa = perf.find(_.getAs[String]("iata_code") == "AA").get
    assert(aa.getAs[Long]("total_flights") == 1L &&
      aa.getAs[Double]("on_time_rate") == 0.0)

    val routes = Flights.goldRouteAnalytics(fact, airports, minFlights = 1)
      .collect()
    assert(routes.length == 2)
    assert(routes.forall(r => r.getAs[String]("origin_airport") != null &&
      r.getAs[String]("destination_airport") != null))

    val buckets = Flights.goldDelayBuckets(fact).collect()
    assert(buckets.map(_.getAs[Double]("pct_of_flights")).sum == 100.0)
    assert(buckets.map(_.getAs[String]("delay_bucket")).toSet ==
      Set("early_or_ontime", "moderate_15_60"))

    val airportStats = Flights.goldAirportAnalytics(fact, airports).collect()
    val jfk = airportStats.find(_.getAs[String]("iata_code") == "JFK").get
    assert(jfk.getAs[Long]("departures") == 1L && jfk.getAs[Long]("arrivals") == 0L)
    val lax = airportStats.find(_.getAs[String]("iata_code") == "LAX").get
    assert(lax.getAs[Long]("departures") == 1L && lax.getAs[Long]("arrivals") == 1L)

    val eff = Flights.goldOperationalEfficiency(fact, airlines).collect()
    assert(eff.length == 2)
    assert(eff.forall(_.getAs[Long]("fleet_size") == 1L))
    assert(eff.forall(_.getAs[Double]("avg_flights_per_aircraft_day") == 1.0))

    val tb = Flights.goldTimeBased(fact, Flights.dimDate(spark)).collect()
    assert(tb.forall(_.getAs[String]("season") == "Winter"),
      "January fixtures are all Winter")
    assert(tb.map(_.getAs[Long]("total_flights")).sum == 2L)

    val otp = Flights.goldRollingOtp(fact).collect()
    assert(otp.length == 2)
    assert(otp.forall(r =>
      math.abs(r.getAs[Double]("rolling_7d_otp") -
        r.getAs[Double]("daily_otp")) < 1e-6),
      "single-day-per-airline fixtures: rolling equals daily (to 6dp — " +
        "the rolling mean routes through a DECIMAL(18,6) sum)")
  }

  test("dim_date spans the reference's 2015–2030 range with 5844 rows") {
    val dd = Flights.dimDate(spark)
    assert(dd.count() == 5844)
    val r = dd.agg(min("full_date"), max("full_date")).collect()(0)
    assert(r.getDate(0).toString == "2015-01-01" &&
      r.getDate(1).toString == "2030-12-31")
  }

  override def afterAll(): Unit = spark.stop()
}
