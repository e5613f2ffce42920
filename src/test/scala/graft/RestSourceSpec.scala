package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer
import org.scalatest.BeforeAndAfterAll

/** The live HTTP connector over a real loopback server: fetch, retry on
  * 5xx, 404/transport-failure as rows (never task failures), partition
  * planning over the url list, and source-level column pruning. */
class RestSourceSpec extends SparkSpecBase with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val flakyHits = new AtomicInteger(0)

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/item/", { ex =>
      val id = ex.getRequestURI.getPath.stripPrefix("/item/")
      val body = s"""{"id":$id,"value":${id.toInt * 10}}""".getBytes
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.createContext("/flaky", { ex =>
      val n = flakyHits.getAndIncrement()
      val (status, body) = if (n < 2) (503, "busy".getBytes) else (200, "recovered".getBytes)
      ex.sendResponseHeaders(status, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.createContext("/", { ex =>
      ex.sendResponseHeaders(404, -1); ex.close()
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def read(urls: Seq[String], opts: Map[String, String] = Map.empty) = {
    val r = spark.read.format("graft.sources.RestSource")
      .option("urls", urls.mkString("\n"))
      .option("retryBackoffMs", "5")
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("fetches each url as a row with status and body") {
    val rows = read((1 to 6).map(i => s"$base/item/$i"))
      .selectExpr("url", "status", "cast(body as string) AS body", "attempts")
      .collect().sortBy(_.getString(0))
    assert(rows.length == 6)
    assert(rows.forall(_.getInt(1) == 200))
    assert(rows.forall(_.getInt(3) == 1))
    val one = rows.find(_.getString(0).endsWith("/item/3")).get
    assert(one.getString(2) == """{"id":3,"value":30}""")
  }

  test("5xx retries with backoff until success; attempts recorded") {
    val row = read(Seq(s"$base/flaky"), Map("retries" -> "4")).collect()(0)
    assert(row.getAs[Int]("status") == 200)
    assert(row.getAs[Int]("attempts") == 3) // 503, 503, 200
    assert(new String(row.getAs[Array[Byte]]("body")) == "recovered")
  }

  test("404 is a final answer: one attempt, row not failure") {
    val row = read(Seq(s"$base/nope"), Map("retries" -> "3")).collect()(0)
    assert(row.getAs[Int]("status") == 404)
    assert(row.getAs[Int]("attempts") == 1)
  }

  test("transport failure (dead port) yields status=-1 row after retries") {
    // bind-then-close: the port is real but nothing listens
    val dead = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val deadPort = dead.getAddress.getPort
    dead.stop(0)
    val row = read(Seq(s"http://127.0.0.1:$deadPort/x"), Map("retries" -> "1")).collect()(0)
    assert(row.getAs[Int]("status") == -1)
    assert(row.getAs[Int]("attempts") == 2)
    assert(row.getAs[String]("error") != null)
  }

  test("readStream polls the endpoint once per trigger, offsets bound the rounds") {
    // /seq returns a fresh monotonically-increasing body per request —
    // distinct bodies across micro-batches prove three REAL polls, not
    // one fetch replayed
    val seqHits = new AtomicInteger(0)
    server.createContext("/seq", { ex =>
      val body = s"tick-${seqHits.incrementAndGet()}".getBytes
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    val q = spark.readStream.format("graft.sources.RestSource")
      .option("urls", s"$base/seq")
      .option("maxPolls", "3")
      .load()
      .selectExpr("cast(body as string) AS body", "status")
      .writeStream.outputMode("append").format("memory").queryName("rest_poll")
      .start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("rest_poll").collect()
    assert(rows.length == 3, s"expected 3 poll rounds, got ${rows.length}")
    assert(rows.forall(_.getInt(1) == 200))
    assert(rows.map(_.getString(0)).toSet == Set("tick-1", "tick-2", "tick-3"))
  }

  test("T4 over HTTP: the 30s health poll as a parsed streaming pipeline") {
    // per-source monotone tick counters, served as JSON — the reference's
    // container /health endpoints (orchestrator.py health loop)
    val counters = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
    server.createContext("/health/", { ex =>
      val src = ex.getRequestURI.getPath.stripPrefix("/health/")
      val n = counters.computeIfAbsent(src, _ => new AtomicInteger(0)).incrementAndGet()
      val body = s"""{"source":"$src","ok":true,"tick":$n}""".getBytes
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    val sources = Seq("landfire", "modis", "weather", "topography")
    val q = spark.readStream.format("graft.sources.RestSource")
      .option("urls", sources.map(s => s"$base/health/$s").mkString("\n"))
      .option("maxPolls", "3")
      .load()
      .selectExpr("from_json(cast(body as string), 'source STRING, ok BOOLEAN, tick INT') AS h")
      .select("h.source", "h.ok", "h.tick")
      .writeStream.outputMode("append").format("memory").queryName("health_poll")
      .start()
    try q.processAllAvailable() finally q.stop()
    val ticks = spark.table("health_poll")
    assert(ticks.count() == 12) // 4 sources x 3 polls
    val perSource = ticks.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource == sources.map(_ -> 3L).toMap)
    // each source saw three REAL polls in order, not one replayed fetch
    import org.apache.spark.sql.functions.collect_set
    val tickSets = ticks.groupBy("source")
      .agg(collect_set("tick").as("ts")).collect()
    assert(tickSets.forall(_.getAs[Seq[Int]]("ts").sorted == Seq(1, 2, 3)))
  }

  test("RestFetch drives fetches from a DataFrame column (the million-request shape)") {
    import graft.ops.RestFetch
    import spark.implicits._
    val requests = (1 to 12).map(i => (i, s"$base/item/$i")).toDF("req_id", "url")
      .repartition(3)
    val fetched = RestFetch.fetchRows(requests, "url", retryBackoffMs = 5)
    assert(fetched.rdd.getNumPartitions == 3) // fetch parallelism = input partitioning
    val rows = fetched
      .selectExpr("req_id", "status", "cast(body as string) AS body")
      .collect().sortBy(_.getInt(0))
    assert(rows.length == 12)
    assert(rows.forall(_.getInt(1) == 200))
    assert(rows(4).getString(2) == """{"id":5,"value":50}""")
    // mixed outcomes stay rows: a 404 url rides along with good ones
    val mixed = RestFetch.fetchRows(
      Seq((1, s"$base/item/1"), (2, s"$base/nope")).toDF("req_id", "url"), "url",
      retryBackoffMs = 5)
      .select("req_id", "status").collect().sortBy(_.getInt(0))
    assert(mixed.map(_.getInt(1)).toSeq == Seq(200, 404))
  }

  test("RequestUrls-built URLs drive real fetches (builder -> fetch -> server echo)") {
    import graft.ops.{RequestUrls, RestFetch}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    server.createContext("/echo", { ex =>
      val body = ex.getRequestURI.toString.getBytes
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    val req = Seq(("req_la", 34.0522, -118.2437, 1000)).toDF("site", "lat", "lon", "buffer_m")
      .withColumn("url", RequestUrls.weatherUrl(
        lit(s"$base/echo"), lit("weather"), col("lat"), col("lon"), lit("demo_key")))
    val row = RestFetch.fetchRows(req, "url", retryBackoffMs = 5)
      .selectExpr("cast(body as string) AS echoed", "status").collect()(0)
    assert(row.getInt(1) == 200)
    // the server saw exactly the reference-shaped query string
    assert(row.getString(0) ==
      "/echo/weather?lat=34.052200&lon=-118.243700&appid=demo_key&units=metric")
  }

  test("minIntervalMs paces request starts per host, shared across partitions") {
    // 5 urls in 5 partitions: pacing state is per (scan, host), so even
    // fully parallel tasks serialize onto 60ms slots — elapsed must cover
    // 4 inter-request gaps no matter how Spark schedules the tasks.
    val t0 = System.nanoTime()
    val rows = read((1 to 5).map(i => s"$base/item/$i"),
      Map("minIntervalMs" -> "60", "urlsPerPartition" -> "1"))
      .select("status").collect()
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(rows.forall(_.getInt(0) == 200))
    assert(elapsedMs >= 4 * 60, s"5 fetches at 60ms spacing finished in ${elapsedMs}ms")
  }

  test("window quota: requests beyond the budget become status=-2 rows, not failures") {
    val rows = read((1 to 6).map(i => s"$base/item/$i"),
      Map("maxRequestsPerWindow" -> "4", "quotaWindowMs" -> "86400000",
        "urlsPerPartition" -> "100"))
      .selectExpr("url", "status", "attempts", "error")
      .collect().sortBy(_.getString(0).stripPrefix(s"$base/item/").toInt)
    assert(rows.length == 6)
    // single partition => sequential fetch order => first 4 succeed
    assert(rows.take(4).forall(_.getInt(1) == 200))
    assert(rows.drop(4).forall(_.getInt(1) == -2))
    assert(rows.drop(4).forall(_.getInt(2) == 0)) // never attempted
    assert(rows.drop(4).forall(_.getString(3).contains("rate budget exhausted")))
  }

  test("maxRequestsPerDay expands to a 24h window budget") {
    val rows = read((1 to 3).map(i => s"$base/item/$i"),
      Map("maxRequestsPerDay" -> "2", "urlsPerPartition" -> "100"))
      .select("status").collect().map(_.getInt(0))
    assert(rows.count(_ == 200) == 2 && rows.count(_ == -2) == 1)
  }

  test("polling stream survives quota exhaustion: later polls degrade to -2 rows, stream completes") {
    // the VERDICT r8 scenario: a ProcessingTime poll against a daily
    // quota (OWM 1,000/day) exhausts it mid-stream — polls past the
    // budget must land as status=-2 rows and the query must finish, not
    // die. One scan = one budget, shared across all 5 poll rounds.
    val q = spark.readStream.format("graft.sources.RestSource")
      .option("urls", s"$base/item/77")
      .option("maxPolls", "5")
      .option("maxRequestsPerWindow", "3")
      .option("quotaWindowMs", "86400000")
      .load()
      .select("status", "attempts")
      .writeStream.outputMode("append").format("memory").queryName("rest_quota_stream")
      .start()
    try q.processAllAvailable() finally q.stop()
    val statuses = spark.table("rest_quota_stream").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(statuses.count(_ == ((200, 1))) == 3, s"expected 3 within-budget polls: $statuses")
    assert(statuses.count(_ == ((-2, 0))) == 2, s"expected 2 budget-denied polls: $statuses")
  }

  test("quota budget is per scan: a new read() starts with a fresh budget") {
    def statuses() = read((1 to 3).map(i => s"$base/item/$i"),
      Map("maxRequestsPerWindow" -> "3", "urlsPerPartition" -> "100"))
      .select("status").collect().map(_.getInt(0)).toSeq
    assert(statuses() == Seq(200, 200, 200))
    assert(statuses() == Seq(200, 200, 200)) // not 3 leftover -2 rows
  }

  test("url list splits into partitions; pruning reaches the source") {
    val df = read((1 to 10).map(i => s"$base/item/$i"), Map("urlsPerPartition" -> "3"))
    assert(df.rdd.getNumPartitions == 4) // ceil(10/3)
    val pruned = df.select("url", "status")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("cols=url,status") || !plan.contains("body"),
      s"body not pruned from source scan:\n$plan")
    assert(pruned.collect().length == 10)
  }
}
