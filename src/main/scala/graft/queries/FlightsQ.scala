package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.domain.Flights

/** Oracle-backed coverage for the 1:1 flight-domain port
  * (`graft.domain.Flights`): flight-shaped bronze rows are derived
  * DETERMINISTICALLY from the driver's `orders` testdata (pure integer /
  * date arithmetic — no RNG, engine-portable), then run through the REAL
  * pipeline (dim builders → factFlight → gold builders), so the gold
  * notebooks' logic gets a DuckDB-green row, not only FlightsSpec's
  * hand-computed values. The oracle mirrors the derivation and the gold
  * aggregation directly over `orders`.
  */
object FlightsQ extends QueryPack {

  private val airlineCodes = Seq("AA", "BB", "CC", "DD", "EE")
  private val airportCodes =
    Seq("ATL", "ORD", "DFW", "DEN", "JFK", "LAX", "SEA")

  private def pick(codes: Seq[String], idx: Column): Column =
    codes.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (c, i)) => when(idx === i, lit(c)).otherwise(acc)
    }

  private def sqlPick(codes: Seq[String], idx: String): String =
    codes.zipWithIndex.map { case (c, i) => s"WHEN $idx = $i THEN '$c'" }
      .mkString("CASE ", " ", " END")

  /** Flight-shaped bronze derived from orders:
    * flight_date folds o_orderdate onto 2015-01-01 + (days % 730) — inside
    * the reference's dim_date span; flight_number = o_orderkey (unique, so
    * the fact's natural-key dedup is a provable no-op and the pipeline
    * stays deterministic); delays/flags are modular arithmetic over the
    * keys. */
  private def flightsBronze(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
    val days = datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
    o.select(
        date_add(lit("2015-01-01").cast("date"), pmod(days, lit(730)).cast("int"))
          .as("flight_date"),
        col("o_orderkey"), col("o_custkey"))
      .select(
        year(col("flight_date")).as("year"),
        month(col("flight_date")).as("month"),
        dayofmonth(col("flight_date")).as("day"),
        pick(airlineCodes, pmod(col("o_orderkey"), lit(5))).as("airline"),
        col("o_orderkey").cast("int").as("flight_number"),
        concat(lit("N"), pmod(col("o_custkey"), lit(97))).as("tail_number"),
        pick(airportCodes, pmod(col("o_custkey"), lit(7))).as("origin_airport"),
        pick(airportCodes, pmod(col("o_custkey") + col("o_orderkey"), lit(7)))
          .as("destination_airport"),
        (pmod(col("o_orderkey"), lit(120)) - lit(20)).cast("int").as("departure_delay"),
        (pmod(col("o_orderkey") * lit(7) + col("o_custkey"), lit(200)) - lit(30))
          .cast("int").as("arrival_delay"),
        pmod(col("o_custkey"), lit(30)).cast("int").as("taxi_out"),
        pmod(col("o_orderkey"), lit(20)).cast("int").as("taxi_in"),
        (lit(60) + pmod(col("o_orderkey"), lit(300))).cast("int").as("air_time"),
        (lit(80) + pmod(col("o_orderkey"), lit(320))).cast("int").as("elapsed_time"),
        (lit(90) + pmod(col("o_orderkey"), lit(310))).cast("int").as("scheduled_time"),
        (lit(200) + pmod(col("o_orderkey"), lit(2400))).cast("int").as("distance"),
        when(pmod(col("o_orderkey"), lit(97)) === 0, 1).otherwise(0).as("diverted"),
        when(pmod(col("o_orderkey"), lit(40)) === 0, 1).otherwise(0).as("cancelled"),
        lit(null).cast("string").as("cancellation_reason"))
  }

  /** The same derivation as [[flightsBronze]] in DuckDB SQL (kept adjacent
    * so the two cannot drift), post-filtered like factFlight's cleanse.
    * The day fold uses ((x % 730) + 730) % 730 because DuckDB's % keeps
    * the dividend's sign while Spark's pmod is always non-negative —
    * without it the two sides diverge for any order date before the
    * 1995-01-01 epoch (e.g. regenerated testdata with 1992-era dates). */
  private val bronzeSql =
    s"""SELECT DATE '2015-01-01'
              + CAST((((CAST(o_orderdate AS DATE) - DATE '1995-01-01') % 730) + 730) % 730
                     AS INTEGER)
              AS flight_date,
            ${sqlPick(airlineCodes, "(o_orderkey % 5)")} AS airline,
            o_orderkey AS flight_number,
            'N' || CAST(o_custkey % 97 AS VARCHAR) AS tail_number,
            ${sqlPick(airportCodes, "(o_custkey % 7)")} AS origin_airport,
            ${sqlPick(airportCodes, "((o_custkey + o_orderkey) % 7)")} AS destination_airport,
            (o_orderkey % 120) - 20 AS departure_delay,
            ((o_orderkey * 7 + o_custkey) % 200) - 30 AS arrival_delay,
            200 + (o_orderkey % 2400) AS distance,
            CASE WHEN o_orderkey % 40 = 0 THEN 1 ELSE 0 END AS cancelled,
            CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END AS diverted
       FROM orders"""

  private def dimAirlines(spark: SparkSession): DataFrame =
    spark.createDataFrame(Seq(
      ("AA", "Alpha Air"), ("BB", "Bravo Blue"), ("CC", "Cirrus Central"),
      ("DD", "Dawn Danube"), ("EE", "Echo Express")))
      .toDF("iata_code", "airline")

  private def dimAirports(spark: SparkSession): DataFrame =
    spark.createDataFrame(Seq(
      ("ATL", "Hartsfield", "Atlanta", "GA", "USA", 33.64, -84.43),
      ("ORD", "O'Hare", "Chicago", "IL", "USA", 41.97, -87.91),
      ("DFW", "Dallas Fort Worth", "Dallas", "TX", "USA", 32.90, -97.04),
      ("DEN", "Denver Intl", "Denver", "CO", "USA", 39.86, -104.67),
      ("JFK", "John F Kennedy", "New York", "NY", "USA", 40.64, -73.78),
      ("LAX", "Los Angeles Intl", "Los Angeles", "CA", "USA", 33.94, -118.41),
      ("SEA", "Seattle Tacoma", "Seattle", "WA", "USA", 47.45, -122.31)))
      .toDF("iata_code", "airport", "city", "state", "country",
        "latitude", "longitude")

  private val factCache = graft.util.ManagedCaches.register()
  private val dateCache = graft.util.ManagedCaches.register()

  /** dim_date, checkpoint-cached: the 2015–2030 generation is only ~6k
    * rows but its plan re-optimizes per consuming query otherwise. */
  private def dimDate(spark: SparkSession): DataFrame =
    graft.util.ManagedCaches.checkpointCache(dateCache, spark, "dim_date")(
      Flights.dimDate(spark))

  /** Derived fact, checkpoint-cached per (session, dir) so the fd_*
    * queries share one MATERIALIZED build (released by Bench group
    * teardown / ManagedCaches.clearAll). Checkpoint rather than persist:
    * the fact's build subtree (bronze derivation + window dedup + 4 dim
    * joins) is large enough that re-optimizing it per gold query cost
    * ~0.1 s each; the truncated plan is a bare scan. */
  private def fact(spark: SparkSession, d: String): DataFrame =
    graft.util.ManagedCaches.checkpointCache(factCache, spark, d)(
      Flights.factFlight(flightsBronze(spark, d), dimDate(spark),
        Flights.dimAirline(dimAirlines(spark)),
        Flights.dimAirport(dimAirports(spark))))

  /** Gold daily flight summary over the derived fact — the reference's
    * first gold notebook, oracle-checked end-to-end through cleanse, dim
    * joins, and the conditional-counter aggregation. */
  private def fdDaily(spark: SparkSession, d: String): DataFrame =
    Flights.goldDailyFlightSummary(fact(spark, d), dimDate(spark))

  private val fdDailySql =
    s"""WITH fl AS ($bronzeSql)
       SELECT flight_date AS full_date,
              COUNT(*) AS total_flights,
              CAST(SUM(CAST(departure_delay AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                AS avg_departure_delay,
              CAST(SUM(CAST(arrival_delay AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                AS avg_arrival_delay,
              CAST(SUM(CASE WHEN cancelled = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS cancelled_flights,
              CAST(SUM(CASE WHEN diverted = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS diverted_flights,
              CAST(SUM(CASE WHEN arrival_delay > 15 THEN 1 ELSE 0 END) AS BIGINT)
                AS delayed_flights,
              CAST(SUM(CASE WHEN arrival_delay > 15 THEN 1 ELSE 0 END) AS BIGINT)
                * 100.0 / COUNT(*) AS delay_rate,
              CAST(SUM(CASE WHEN cancelled = 1 THEN 1 ELSE 0 END) AS BIGINT)
                * 100.0 / COUNT(*) AS cancellation_rate
       FROM fl
       WHERE origin_airport <> destination_airport
       GROUP BY flight_date
       ORDER BY full_date"""

  /** Gold airline performance over the derived fact (notebook 02). */
  private def fdAirline(spark: SparkSession, d: String): DataFrame =
    Flights.goldAirlinePerformance(fact(spark, d),
      Flights.dimAirline(dimAirlines(spark)))

  private val fdAirlineSql = {
    val skCase = airlineCodes.zipWithIndex
      .map { case (c, i) => s"WHEN '$c' THEN ${i + 1}" }
      .mkString("CASE airline_code ", " ", " END")
    val nameCase = airlineCodes.zip(Seq("Alpha Air", "Bravo Blue",
        "Cirrus Central", "Dawn Danube", "Echo Express"))
      .map { case (c, n) => s"WHEN '$c' THEN '$n'" }
      .mkString("CASE airline_code ", " ", " END")
    s"""WITH fl AS ($bronzeSql)
       SELECT CAST($skCase AS BIGINT) AS airline_sk,
              airline_code AS iata_code,
              $nameCase AS airline,
              total_flights, avg_departure_delay, avg_arrival_delay,
              total_distance, on_time_rate, cancellation_rate
       FROM (
         SELECT airline AS airline_code,
                COUNT(*) AS total_flights,
                CAST(SUM(CAST(departure_delay AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                  AS avg_departure_delay,
                CAST(SUM(CAST(arrival_delay AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                  AS avg_arrival_delay,
                CAST(SUM(CAST(distance AS DECIMAL(18,2))) AS DOUBLE) AS total_distance,
                CAST(SUM(CASE WHEN arrival_delay <= 15 THEN 1 ELSE 0 END) AS BIGINT)
                  * 100.0 / COUNT(*) AS on_time_rate,
                CAST(SUM(CASE WHEN cancelled = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  * 100.0 / COUNT(*) AS cancellation_rate
         FROM fl
         WHERE origin_airport <> destination_airport
         GROUP BY airline) t
       ORDER BY total_flights DESC, iata_code"""
  }

  // ---- shared oracle scaffolding for the remaining gold notebooks ----

  private val airportNames = Seq(
    ("ATL", "Hartsfield", "Atlanta"), ("DEN", "Denver Intl", "Denver"),
    ("DFW", "Dallas Fort Worth", "Dallas"), ("JFK", "John F Kennedy", "New York"),
    ("LAX", "Los Angeles Intl", "Los Angeles"), ("ORD", "O'Hare", "Chicago"),
    ("SEA", "Seattle Tacoma", "Seattle"))

  /** windowSk ranks by iata_code, so SKs are the alphabetical position. */
  private def airportSkCase(codeExpr: String): String =
    airportCodes.sorted.zipWithIndex
      .map { case (c, i) => s"WHEN '$c' THEN ${i + 1}" }
      .mkString(s"CASE $codeExpr ", " ", " END")

  private def airportAttrCase(skExpr: String, attr: ((String, String, String)) => String): String =
    airportNames.zipWithIndex
      .map { case (t, i) => s"WHEN ${i + 1} THEN '${attr(t).replace("'", "''")}'" }
      .mkString(s"CASE $skExpr ", " ", " END")

  private val airlineSkCase =
    airlineCodes.zipWithIndex.map { case (c, i) => s"WHEN '$c' THEN ${i + 1}" }
      .mkString("CASE airline ", " ", " END")

  /** Derived fact as a SQL CTE chain: bronze derivation → cleanse filter →
    * SK mapping. Every remaining fd_* oracle builds on this. */
  private val factSql =
    s"""fl AS ($bronzeSql),
       fact AS (
         SELECT CAST(${airportSkCase("origin_airport")} AS BIGINT) AS origin_airport_sk,
                CAST(${airportSkCase("destination_airport")} AS BIGINT) AS destination_airport_sk,
                CAST($airlineSkCase AS BIGINT) AS airline_sk,
                flight_date, tail_number,
                departure_delay, arrival_delay, distance, cancelled, diverted
         FROM fl WHERE origin_airport <> destination_airport)"""

  private def avgExactSql(c: String): String =
    s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)"

  /** Gold 03+08 — route analytics: aggregate by route, HAVING floor,
    * enrich with both airport dims AFTER the aggregate, top-k busiest. */
  private def fdRoute(spark: SparkSession, d: String): DataFrame =
    Flights.goldRouteAnalytics(fact(spark, d),
      Flights.dimAirport(dimAirports(spark)), minFlights = 2, topK = 50)

  private val fdRouteSql =
    s"""WITH $factSql,
       agg AS (
         SELECT origin_airport_sk, destination_airport_sk,
                COUNT(*) AS total_flights,
                ${avgExactSql("arrival_delay")} AS avg_arrival_delay,
                COUNT(DISTINCT airline_sk) AS airlines_serving
         FROM fact GROUP BY 1, 2 HAVING COUNT(*) >= 2)
       SELECT origin_airport_sk, destination_airport_sk, total_flights,
              avg_arrival_delay, airlines_serving,
              ${airportAttrCase("origin_airport_sk", _._2)} AS origin_airport,
              ${airportAttrCase("origin_airport_sk", _._3)} AS origin_city,
              ${airportAttrCase("destination_airport_sk", _._2)} AS destination_airport,
              ${airportAttrCase("destination_airport_sk", _._3)} AS destination_city
       FROM agg
       ORDER BY total_flights DESC, origin_airport, destination_airport
       LIMIT 50"""

  /** Gold 04 — airport analytics: dual-role full-outer union of the
    * origin and destination views + dim attributes. */
  private def fdAirport(spark: SparkSession, d: String): DataFrame =
    Flights.goldAirportAnalytics(fact(spark, d),
      Flights.dimAirport(dimAirports(spark)))

  private val fdAirportSql =
    s"""WITH $factSql,
       dep AS (
         SELECT origin_airport_sk AS airport_sk, COUNT(*) AS departures,
                ${avgExactSql("departure_delay")} AS avg_departure_delay,
                COUNT(DISTINCT airline_sk) AS airlines_serving,
                COUNT(DISTINCT destination_airport_sk) AS destinations_served
         FROM fact GROUP BY 1),
       arr AS (
         SELECT destination_airport_sk AS airport_sk, COUNT(*) AS arrivals,
                ${avgExactSql("arrival_delay")} AS avg_arrival_delay
         FROM fact GROUP BY 1)
       SELECT airport_sk, COALESCE(departures, 0) AS departures,
              avg_departure_delay, airlines_serving, destinations_served,
              COALESCE(arrivals, 0) AS arrivals, avg_arrival_delay,
              ${airportAttrCase("airport_sk", _._1)} AS iata_code,
              ${airportAttrCase("airport_sk", _._2)} AS airport,
              ${airportAttrCase("airport_sk", _._3)} AS city,
              CASE airport_sk WHEN 1 THEN 'GA' WHEN 2 THEN 'CO' WHEN 3 THEN 'TX'
                WHEN 4 THEN 'NY' WHEN 5 THEN 'CA' WHEN 6 THEN 'IL'
                WHEN 7 THEN 'WA' END AS state
       FROM dep FULL OUTER JOIN arr USING (airport_sk)
       ORDER BY departures DESC, iata_code"""

  /** Gold 06 — delay-distribution buckets with share-of-total. */
  private def fdDelayBuckets(spark: SparkSession, d: String): DataFrame =
    Flights.goldDelayBuckets(fact(spark, d))

  private val fdDelaySql =
    s"""WITH $factSql,
       b AS (SELECT CASE WHEN arrival_delay <= 0 THEN 'early_or_ontime'
                         WHEN arrival_delay <= 15 THEN 'minor_0_15'
                         WHEN arrival_delay <= 60 THEN 'moderate_15_60'
                         WHEN arrival_delay <= 180 THEN 'severe_60_180'
                         ELSE 'extreme_180_plus' END AS delay_bucket,
                    arrival_delay
             FROM fact),
       g AS (SELECT delay_bucket, COUNT(*) AS n_flights,
                    ${avgExactSql("arrival_delay")} AS avg_delay
             FROM b GROUP BY 1)
       SELECT delay_bucket, n_flights, avg_delay,
              n_flights * 100.0 / SUM(n_flights) OVER () AS pct_of_flights
       FROM g ORDER BY delay_bucket"""

  /** Gold 05 — time-based season/weekend analytics (weekend = ISO
    * day-of-week ≥ 6, the dim_date convention). */
  private def fdTimeBased(spark: SparkSession, d: String): DataFrame =
    Flights.goldTimeBased(fact(spark, d), dimDate(spark))

  private val fdTimeSql =
    s"""WITH $factSql,
       t AS (SELECT CASE WHEN month(flight_date) IN (12, 1, 2) THEN 'Winter'
                         WHEN month(flight_date) IN (3, 4, 5) THEN 'Spring'
                         WHEN month(flight_date) IN (6, 7, 8) THEN 'Summer'
                         ELSE 'Fall' END AS season,
                    (isodow(flight_date) >= 6) AS is_weekend,
                    departure_delay, arrival_delay, cancelled
             FROM fact)
       SELECT season, is_weekend, COUNT(*) AS total_flights,
              ${avgExactSql("departure_delay")} AS avg_departure_delay,
              ${avgExactSql("arrival_delay")} AS avg_arrival_delay,
              CAST(SUM(CASE WHEN cancelled = 1 THEN 1 ELSE 0 END) AS BIGINT)
                * 100.0 / COUNT(*) AS cancellation_rate,
              CASE season WHEN 'Winter' THEN 1 WHEN 'Spring' THEN 2
                WHEN 'Summer' THEN 3 ELSE 4 END AS season_rank
       FROM t GROUP BY 1, 2 ORDER BY season_rank, is_weekend"""

  /** Gold 07a — operational efficiency: flights per (airline, aircraft,
    * day), then per-airline fleet stats. */
  private def fdOperEff(spark: SparkSession, d: String): DataFrame =
    Flights.goldOperationalEfficiency(fact(spark, d),
      Flights.dimAirline(dimAirlines(spark)))

  private val fdOperSql = {
    val nameCase = airlineCodes.zip(Seq("Alpha Air", "Bravo Blue",
        "Cirrus Central", "Dawn Danube", "Echo Express"))
      .map { case (c, n) => s"WHEN ${airlineCodes.indexOf(c) + 1} THEN '$n'" }
      .mkString("CASE airline_sk ", " ", " END")
    val codeCase = airlineCodes.zipWithIndex
      .map { case (c, i) => s"WHEN ${i + 1} THEN '$c'" }
      .mkString("CASE airline_sk ", " ", " END")
    s"""WITH $factSql,
       pad AS (SELECT airline_sk, tail_number, flight_date, COUNT(*) AS fpd
               FROM fact WHERE tail_number IS NOT NULL GROUP BY 1, 2, 3),
       per AS (SELECT airline_sk,
                      CAST(SUM(fpd) AS DOUBLE)
                        / COUNT(DISTINCT (tail_number, flight_date))
                        AS avg_flights_per_aircraft_day,
                      MAX(fpd) AS max_flights_per_aircraft_day,
                      COUNT(DISTINCT tail_number) AS fleet_size
               FROM pad GROUP BY 1)
       SELECT airline_sk, $codeCase AS iata_code, $nameCase AS airline,
              avg_flights_per_aircraft_day, max_flights_per_aircraft_day,
              fleet_size
       FROM per ORDER BY iata_code"""
  }

  /** Gold 07b — 7-day rolling OTP per airline (rolling mean through a
    * DECIMAL(18,6) window sum — order-independent, see goldRollingOtp). */
  private def fdRollingOtp(spark: SparkSession, d: String): DataFrame =
    Flights.goldRollingOtp(fact(spark, d))

  private val fdOtpSql =
    s"""WITH $factSql,
       daily AS (
         SELECT airline_sk, flight_date,
                CAST(SUM(CASE WHEN arrival_delay <= 15 THEN 1 ELSE 0 END) AS BIGINT)
                  * 100.0 / COUNT(*) AS daily_otp
         FROM fact GROUP BY 1, 2)
       SELECT airline_sk, flight_date, daily_otp,
              CAST(SUM(CAST(ROUND(daily_otp, 6) AS DECIMAL(18,6)))
                     OVER (PARTITION BY airline_sk ORDER BY flight_date
                           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
                / COUNT(*) OVER (PARTITION BY airline_sk ORDER BY flight_date
                                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS rolling_7d_otp
       FROM daily ORDER BY airline_sk, flight_date"""

  /** The flight-fact checkpoint build as its own timed bench row, so
    * fd_airline_perf (first-alphabetical member) stops being billed the
    * whole derivation (the r6 attribution artifact). */
  override def warms: Seq[Q] = Seq(
    Q("flights_fact_build", (s, d) => fact(s, d), None))

  override def queries: Seq[Q] = Seq(
    Q("fd_daily_summary", fdDaily, Some(fdDailySql)),
    Q("fd_airline_perf", fdAirline, Some(fdAirlineSql)),
    Q("fd_route_analytics", fdRoute, Some(fdRouteSql)),
    Q("fd_airport_analytics", fdAirport, Some(fdAirportSql)),
    Q("fd_delay_buckets", fdDelayBuckets, Some(fdDelaySql)),
    Q("fd_time_based", fdTimeBased, Some(fdTimeSql)),
    Q("fd_oper_efficiency", fdOperEff, Some(fdOperSql)),
    Q("fd_rolling_otp", fdRollingOtp, Some(fdOtpSql)))
}
