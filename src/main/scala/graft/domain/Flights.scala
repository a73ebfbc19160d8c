package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Cleaning
import graft.io.{Sinks, Sources}
import graft.silver.SurrogateKeys
import graft.util.Exact._

/** The reference's concrete domain, 1:1: US flight-delay schemas and the
  * bronze→silver→gold builders over them, so a user of
  * akin11235/unicargo-medallion-data-pipeline can switch engines and run
  * the same pipeline on the same CSVs.
  *
  * Schemas are ports of `unicargo_etl/scripts/01_bronze/schemas/
  * {flights,airlines,airports}_schema.py` (31/2/7 columns, all nullable).
  * Builders mirror the silver notebooks (`02_silver - Dimensional
  * modelling/`): cleanse → dedup → SK → joins → typed select, including
  * the reference's Monday=1 day-of-week convention
  * (`02_silver_unicargo_create_dim_date.ipynb:92`, adjustment at
  * `02_silver_unicargo_create_fact_flights.ipynb:418-424`).
  */
object Flights {

  /** `flights_schema.py:3-35` — 26 ints + 5 strings, all nullable. */
  val flightsSchema: StructType = StructType(Seq(
    "year", "month", "day", "day_of_week").map(StructField(_, IntegerType)) ++
    Seq(StructField("airline", StringType),
      StructField("flight_number", IntegerType),
      StructField("tail_number", StringType),
      StructField("origin_airport", StringType),
      StructField("destination_airport", StringType)) ++
    Seq("scheduled_departure", "departure_time", "departure_delay",
      "taxi_out", "wheels_off", "scheduled_time", "elapsed_time", "air_time",
      "distance", "wheels_on", "taxi_in", "scheduled_arrival", "arrival_time",
      "arrival_delay", "diverted", "cancelled").map(StructField(_, IntegerType)) ++
    Seq(StructField("cancellation_reason", StringType)) ++
    Seq("air_system_delay", "security_delay", "airline_delay",
      "late_aircraft_delay", "weather_delay").map(StructField(_, IntegerType)))

  /** `airlines_schema.py:3-6`. */
  val airlinesSchema: StructType = StructType(Seq(
    StructField("iata_code", StringType),
    StructField("airline", StringType)))

  /** `airports_schema.py:4-12`. */
  val airportsSchema: StructType = StructType(Seq(
    StructField("iata_code", StringType),
    StructField("airport", StringType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("country", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType)))

  /** Bronze ingest (EP1/EP2: schema-enforced CSV → metadata → table). */
  def bronzeIngest(spark: SparkSession, csvPath: String, schema: StructType,
      pipelineId: String, runId: String, taskId: String): DataFrame =
    Cleaning.addPipelineMetadata(pipelineId, runId, taskId)(
      Sources.readCsv(spark, csvPath, schema))

  /** dim_airline (`02_silver_unicargo_create_dim_airlines.ipynb:101-103`):
    * dedup by natural key → ranked SK (14 airlines → global window is
    * free). */
  def dimAirline(airlinesBronze: DataFrame): DataFrame =
    Cleaning.removeDuplicates(Seq("iata_code"))(airlinesBronze)
      .filter(col("iata_code").isNotNull)
      .withColumn("airline_sk", SurrogateKeys.windowSk(Seq(col("iata_code"))))
      .select("airline_sk", "iata_code", "airline")

  /** dim_airport (`…create_dim_airports.ipynb:38-51`). */
  def dimAirport(airportsBronze: DataFrame): DataFrame =
    Cleaning.removeDuplicates(Seq("iata_code"))(airportsBronze)
      .filter(col("iata_code").isNotNull)
      .withColumn("airport_sk", SurrogateKeys.windowSk(Seq(col("iata_code"))))
      .select("airport_sk", "iata_code", "airport", "city", "state",
        "country", "latitude", "longitude")

  /** dim_date 2015-01-01..2030-12-31 (reference span, 5,844 rows;
    * generated distributed — SURVEY §4 inefficiency (d) fixed). */
  def dimDate(spark: SparkSession): DataFrame =
    Sources.dateDim(spark, "2015-01-01", "2030-12-31")
      .withColumn("date_sk",
        row_number().over(Window.orderBy("full_date")).cast("int"))

  /** fact_flight (`…create_fact_flights.ipynb:42-360`):
    * 1. cleanse — required-key null filters, origin≠destination theta
    *    filter, flight_date synthesis (concat+lpad+to_date), composite
    *    natural-key dedup;
    * 2. role-played dim joins (date, airline, origin/destination airport
    *    via aliased projections), natural keys dropped after each join;
    * 3. flight_sk + typed select (measures cast to double).
    */
  def factFlight(flightsBronze: DataFrame, dimDateDf: DataFrame,
      dimAirlineDf: DataFrame, dimAirportDf: DataFrame): DataFrame = {
    val cleansed = flightsBronze
      .filter(col("airline").isNotNull && col("origin_airport").isNotNull &&
        col("destination_airport").isNotNull && col("flight_number").isNotNull)
      .filter(col("origin_airport") =!= col("destination_airport"))
      .withColumn("flight_date", to_date(concat(
        col("year").cast("string"), lit("-"),
        lpad(col("month").cast("string"), 2, "0"), lit("-"),
        lpad(col("day").cast("string"), 2, "0")), "yyyy-MM-dd"))
      .filter(col("flight_date").isNotNull)
      .transform(Cleaning.removeDuplicates(
        Seq("flight_number", "flight_date", "origin_airport", "destination_airport")))
    val dd = dimDateDf.select(col("date_sk"), col("full_date"))
    val da = dimAirlineDf.select(col("airline_sk"), col("iata_code"))
    val origin = dimAirportDf.select(
      col("airport_sk").as("origin_airport_sk"), col("iata_code").as("origin_iata"))
    val dest = dimAirportDf.select(
      col("airport_sk").as("destination_airport_sk"), col("iata_code").as("dest_iata"))
    cleansed
      .join(broadcast(dd), col("flight_date") === col("full_date"), "inner")
      .drop("full_date")
      .join(broadcast(da), col("airline") === col("iata_code"), "inner")
      .drop("iata_code")
      .join(broadcast(origin), col("origin_airport") === col("origin_iata"), "inner")
      .drop("origin_iata")
      .join(broadcast(dest), col("destination_airport") === col("dest_iata"), "inner")
      .drop("dest_iata")
      .withColumn("flight_sk", monotonically_increasing_id())
      .select(
        col("flight_sk"), col("date_sk"), col("airline_sk"),
        col("origin_airport_sk"), col("destination_airport_sk"),
        col("flight_number"), col("tail_number"), col("flight_date"),
        col("departure_delay").cast("double").as("departure_delay"),
        col("arrival_delay").cast("double").as("arrival_delay"),
        col("taxi_out").cast("double").as("taxi_out"),
        col("taxi_in").cast("double").as("taxi_in"),
        col("air_time").cast("double").as("air_time"),
        col("elapsed_time").cast("double").as("elapsed_time"),
        col("scheduled_time").cast("double").as("scheduled_time"),
        col("distance").cast("double").as("distance"),
        col("diverted"), col("cancelled"), col("cancellation_reason"),
        // reference's ISO day-of-week consistency adjustment
        // (`…fact_flights.ipynb:418-424`): Spark dayofweek is Sunday=1,
        // dim_date uses Monday=1
        (((dayofweek(col("flight_date")) + lit(5)) % lit(7)) + lit(1))
          .as("day_of_week"))
  }

  /** Gold: daily flight summary (`03_gold_unikargo_01_daily_analytics
    * .ipynb:66-79`) — the reference's first gold table, with the
    * cancelled/delayed conditional counters and rates. */
  def goldDailyFlightSummary(fact: DataFrame, dimDateDf: DataFrame): DataFrame =
    fact.join(broadcast(dimDateDf.select("date_sk", "full_date")), Seq("date_sk"))
      .groupBy("full_date")
      .agg(
        count(lit(1)).as("total_flights"),
        avgExact(col("departure_delay")).as("avg_departure_delay"),
        avgExact(col("arrival_delay")).as("avg_arrival_delay"),
        sum(when(col("cancelled") === 1, 1).otherwise(0)).as("cancelled_flights"),
        sum(when(col("diverted") === 1, 1).otherwise(0)).as("diverted_flights"),
        sum(when(col("arrival_delay") > 15, 1).otherwise(0)).as("delayed_flights"),
        (sum(when(col("arrival_delay") > 15, 1).otherwise(0)) * lit(100.0) /
          count(lit(1))).as("delay_rate"),
        (sum(when(col("cancelled") === 1, 1).otherwise(0)) * lit(100.0) /
          count(lit(1))).as("cancellation_rate"))
      .orderBy("full_date")

  /** Gold: airline performance (`03_gold_unikargo_02_airline_performance
    * .ipynb:72-82`): per-airline delay stats, on-time rate, volume. */
  def goldAirlinePerformance(fact: DataFrame, dimAirlineDf: DataFrame): DataFrame =
    fact.join(broadcast(dimAirlineDf), Seq("airline_sk"))
      .groupBy("airline_sk", "iata_code", "airline")
      .agg(
        count(lit(1)).as("total_flights"),
        avgExact(col("departure_delay")).as("avg_departure_delay"),
        avgExact(col("arrival_delay")).as("avg_arrival_delay"),
        sumExact(col("distance")).as("total_distance"),
        (sum(when(col("arrival_delay") <= 15, 1).otherwise(0)) * lit(100.0) /
          count(lit(1))).as("on_time_rate"),
        (sum(when(col("cancelled") === 1, 1).otherwise(0)) * lit(100.0) /
          count(lit(1))).as("cancellation_rate"))
      .orderBy(col("total_flights").desc, col("iata_code"))

  /** Gold: route analytics (`03_gold_unikargo_03_route_analytics
    * .ipynb:74-131`): aggregate by route, HAVING volume floor, enrich with
    * both airport dims AFTER the aggregate, top-k busiest. */
  def goldRouteAnalytics(fact: DataFrame, dimAirportDf: DataFrame,
      minFlights: Long = 2, topK: Int = 50): DataFrame = {
    val routeAgg = fact
      .groupBy("origin_airport_sk", "destination_airport_sk")
      .agg(
        count(lit(1)).as("total_flights"),
        avgExact(col("arrival_delay")).as("avg_arrival_delay"),
        countDistinct(col("airline_sk")).as("airlines_serving"))
      .filter(col("total_flights") >= minFlights)
    routeAgg
      .join(broadcast(dimAirportDf.select(
        col("airport_sk").as("origin_airport_sk"),
        col("airport").as("origin_airport"), col("city").as("origin_city"))),
        Seq("origin_airport_sk"))
      .join(broadcast(dimAirportDf.select(
        col("airport_sk").as("destination_airport_sk"),
        col("airport").as("destination_airport"), col("city").as("destination_city"))),
        Seq("destination_airport_sk"))
      .orderBy(col("total_flights").desc, col("origin_airport"),
        col("destination_airport"))
      .limit(topK)
  }

  /** Gold: airport analytics (`03_gold_unikargo_04_airport_analytics
    * .ipynb:73-105`): per-airport departure volume, delay averages, and
    * distinct airlines/destinations served — the union of the origin and
    * destination role views. */
  def goldAirportAnalytics(fact: DataFrame, dimAirportDf: DataFrame): DataFrame = {
    val departures = fact.groupBy(col("origin_airport_sk").as("airport_sk"))
      .agg(count(lit(1)).as("departures"),
        avgExact(col("departure_delay")).as("avg_departure_delay"),
        countDistinct(col("airline_sk")).as("airlines_serving"),
        countDistinct(col("destination_airport_sk")).as("destinations_served"))
    val arrivals = fact.groupBy(col("destination_airport_sk").as("airport_sk"))
      .agg(count(lit(1)).as("arrivals"),
        avgExact(col("arrival_delay")).as("avg_arrival_delay"))
    departures
      .join(arrivals, Seq("airport_sk"), "full_outer")
      .join(broadcast(dimAirportDf.select("airport_sk", "iata_code", "airport",
        "city", "state")), Seq("airport_sk"))
      .na.fill(0L, Seq("departures", "arrivals"))
      .orderBy(col("departures").desc, col("iata_code"))
  }

  /** Gold: operational efficiency (`03_gold_unikargo_07_operational_
    * efficiency_analytics.ipynb:70-76`): the two-level aggregation —
    * flights per (airline, aircraft, day), then per-airline fleet stats.
    */
  def goldOperationalEfficiency(fact: DataFrame, dimAirlineDf: DataFrame): DataFrame = {
    val perAircraftDay = fact
      .filter(col("tail_number").isNotNull)
      .groupBy("airline_sk", "tail_number", "flight_date")
      .agg(count(lit(1)).as("flights_per_day"))
    perAircraftDay
      .groupBy("airline_sk")
      .agg(
        (sum(col("flights_per_day")).cast("double") /
          countDistinct(col("tail_number"), col("flight_date")))
          .as("avg_flights_per_aircraft_day"),
        max(col("flights_per_day")).as("max_flights_per_aircraft_day"),
        countDistinct(col("tail_number")).as("fleet_size"))
      .join(broadcast(dimAirlineDf), Seq("airline_sk"))
      .select("airline_sk", "iata_code", "airline",
        "avg_flights_per_aircraft_day", "max_flights_per_aircraft_day",
        "fleet_size")
      .orderBy("iata_code")
  }

  /** Gold: delay-distribution buckets (`03_gold_unikargo_06_delay_analytics
    * .ipynb:68-80`): the reference's 5-way delay classification with
    * share-of-total. */
  def goldDelayBuckets(fact: DataFrame): DataFrame = {
    val bucketed = fact
      .withColumn("delay_bucket",
        when(col("arrival_delay") <= 0, "early_or_ontime")
          .when(col("arrival_delay") <= 15, "minor_0_15")
          .when(col("arrival_delay") <= 60, "moderate_15_60")
          .when(col("arrival_delay") <= 180, "severe_60_180")
          .otherwise("extreme_180_plus"))
      .groupBy("delay_bucket")
      .agg(count(lit(1)).as("n_flights"),
        avgExact(col("arrival_delay")).as("avg_delay"))
    bucketed.select(col("delay_bucket"), col("n_flights"), col("avg_delay"),
        (col("n_flights") * lit(100.0) /
          sum(col("n_flights")).over(Window.partitionBy())).as("pct_of_flights"))
      .orderBy("delay_bucket")
  }

  /** Gold: time-based analytics (`03_gold_unikargo_05_time_based_analytics
    * .ipynb:69-117`): season buckets + weekend flag from the date dim,
    * ordered by the reference's custom season key. */
  def goldTimeBased(fact: DataFrame, dimDateDf: DataFrame): DataFrame = {
    val withDate = fact.join(broadcast(dimDateDf.select(
      col("date_sk"), col("month"), col("is_weekend"))), Seq("date_sk"))
      .withColumn("season",
        when(col("month").isin(12, 1, 2), "Winter")
          .when(col("month").isin(3, 4, 5), "Spring")
          .when(col("month").isin(6, 7, 8), "Summer")
          .otherwise("Fall"))
    withDate.groupBy("season", "is_weekend")
      .agg(count(lit(1)).as("total_flights"),
        avgExact(col("departure_delay")).as("avg_departure_delay"),
        avgExact(col("arrival_delay")).as("avg_arrival_delay"),
        (sum(when(col("cancelled") === 1, 1).otherwise(0)) * lit(100.0) /
          count(lit(1))).as("cancellation_rate"))
      .withColumn("season_rank",
        when(col("season") === "Winter", 1).when(col("season") === "Spring", 2)
          .when(col("season") === "Summer", 3).otherwise(4))
      .orderBy("season_rank", "is_weekend")
  }

  /** Gold: 7-day rolling on-time performance per airline
    * (`03_gold_unikargo_07_…ipynb:98-108`): daily OTP then a
    * rowsBetween(-6, 0) window partitioned by airline.
    *
    * The rolling mean goes through a DECIMAL(18,6) sum of the
    * 6dp-rounded daily values rather than a raw double window AVG:
    * sliding-window float summation is engine-order-dependent (Spark
    * recomputes the frame linearly, DuckDB combines via segment trees),
    * while decimal sums are order-independent — the same `util.Exact`
    * discipline every other aggregate follows, applied to windows. */
  def goldRollingOtp(fact: DataFrame): DataFrame = {
    val daily = fact.groupBy("airline_sk", "flight_date")
      .agg((sum(when(col("arrival_delay") <= 15, 1).otherwise(0)) * lit(100.0) /
        count(lit(1))).as("daily_otp"))
    val w = Window.partitionBy("airline_sk").orderBy("flight_date")
      .rowsBetween(-6, 0)
    daily.withColumn("rolling_7d_otp",
        sum(round(col("daily_otp"), 6).cast(DecimalType(18, 6))).over(w)
          .cast("double") / count(lit(1)).over(w))
      .orderBy("airline_sk", "flight_date")
  }

  /** End-to-end medallion run over flight CSVs into a warehouse dir
    * (EP1+EP3): bronze ingest ×3 → dims → fact → gold, each layer
    * persisted via the partitioned/managed sinks. Returns the gold
    * daily summary. */
  def runPipeline(spark: SparkSession, flightsCsv: String, airlinesCsv: String,
      airportsCsv: String, warehouseDir: String): DataFrame = {
    val runId = java.util.UUID.randomUUID().toString
    val flightsBronze = bronzeIngest(spark, flightsCsv, flightsSchema,
      "pl_flights", runId, "tsk_flights_read_raw")
    val airlinesBronze = bronzeIngest(spark, airlinesCsv, airlinesSchema,
      "pl_flights", runId, "tsk_airlines_read_raw")
    val airportsBronze = bronzeIngest(spark, airportsCsv, airportsSchema,
      "pl_flights", runId, "tsk_airports_read_raw")
    val dAirline = dimAirline(airlinesBronze)
    val dAirport = dimAirport(airportsBronze)
    val dDate = dimDate(spark)
    val fact = factFlight(flightsBronze, dDate, dAirline, dAirport)
    Cleaning.validateDataQuality(fact,
      Seq("date_sk", "airline_sk", "origin_airport_sk", "destination_airport_sk"))
    Sinks.savePartitioned(fact.withColumn("p_date", col("flight_date")),
      s"$warehouseDir/fact_flight", Seq("p_date"), mode = "overwrite")
    val gold = goldDailyFlightSummary(fact, dDate)
    Sinks.savePartitioned(gold.withColumn("p_date", col("full_date")),
      s"$warehouseDir/daily_flight_summary", Seq("p_date"), mode = "overwrite")
    gold
  }
}
