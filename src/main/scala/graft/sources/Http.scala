package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** HTTP connector (reference python/pathway/io/http: `rest_connector` ingress
  * + HTTP writer; engine serving loop src/engine/http_server.rs:244).
  *
  * Ingress is Spark-first: the handler spools each accepted POST body as an
  * atomically-renamed JSON-lines file and the table is just
  * `readStream.schema(...).json(spoolDir)` — Spark's own streaming file
  * source does discovery, exactly-once tracking and recovery, which is how a
  * webhook feed is productionized without a broker. The JDK HttpServer keeps
  * the container dependency-free; swap any HTTP frontend that writes the same
  * spool (or S3 prefix) without touching the query.
  *
  * Egress posts per PARTITION from executors (batched JSON lines per
  * request) — no driver collect, mirroring JdbcSink's shape.
  */
object Http {

  /** Start a REST ingress endpoint: every `POST path` body (one JSON object
    * or JSON-lines) is acked with `{"id": "<uuid>"}` and becomes rows of the
    * returned streaming DataFrame. Caller stops the server. */
  def restConnector(spark: SparkSession, spoolDir: String, schema: StructType,
      port: Int = 0, path: String = "/ingest"): (HttpServer, DataFrame) = {
    Files.createDirectories(Paths.get(spoolDir))
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext(path, new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        try {
          if (ex.getRequestMethod == "POST") {
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            val id = java.util.UUID.randomUUID().toString
            // write-then-rename so the file source never reads a partial file
            val tmp = Paths.get(spoolDir, s".$id.json.tmp")
            Files.write(tmp, (body.stripLineEnd + "\n").getBytes(StandardCharsets.UTF_8))
            Files.move(tmp, Paths.get(spoolDir, s"$id.json"), StandardCopyOption.ATOMIC_MOVE)
            val resp = s"""{"id":"$id"}""".getBytes(StandardCharsets.UTF_8)
            ex.sendResponseHeaders(200, resp.length)
            ex.getResponseBody.write(resp)
          } else ex.sendResponseHeaders(405, -1)
        } finally ex.close()
      }
    })
    server.start()
    (server, spark.readStream.schema(schema).json(spoolDir))
  }

  /** POST one batch as JSON lines, one request per partition (executor-side). */
  def postBatch(batch: DataFrame, url: String): Unit =
    postLines(batch.toJSON, url)

  /** POST pre-rendered lines, one request per partition (executor-side). */
  def postLines(rendered: org.apache.spark.sql.Dataset[String], url: String): Unit =
    rendered.foreachPartition { (lines: Iterator[String]) =>
      if (lines.nonEmpty) {
        val conn = new java.net.URL(url).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", "application/json")
        val out = conn.getOutputStream
        lines.foreach(l => out.write((l + "\n").getBytes(StandardCharsets.UTF_8)))
        out.close()
        val rc = conn.getResponseCode
        if (rc >= 400) throw new java.io.IOException(s"HTTP sink got $rc from $url")
        conn.getInputStream.close()
      }
    }

  /** Streaming HTTP writer: every microbatch POSTed to `url`. */
  def postSink(df: DataFrame, url: String): DataStreamWriter[Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, _: Long) => postBatch(batch, url) }

  /** Vector-store point upserts (reference io/{qdrant,pinecone,...} writers):
    * rows become `{"id":…,"vector":[…],"payload":{…}}` JSON lines POSTed per
    * partition — the generic REST shape the vector-DB upsert APIs share;
    * an endpoint-specific envelope is a format tweak on the receiving side. */
  def postVectors(batch: DataFrame, idCol: String, vecCol: String, url: String): Unit = {
    import org.apache.spark.sql.functions._
    val payloadCols = batch.columns.filterNot(c => c == idCol || c == vecCol)
    val points = batch.select(to_json(struct(
      col(idCol).as("id"), col(vecCol).as("vector"),
      struct(payloadCols.map(col): _*).as("payload"))).as("json"))
    postLines(points.select(col("json")).as(org.apache.spark.sql.Encoders.STRING), url)
  }

  /** Streaming vector-store writer. */
  def vectorSink(df: DataFrame, idCol: String, vecCol: String,
      url: String): DataStreamWriter[Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      postVectors(batch, idCol, vecCol, url)
    }
}
