package graft.state

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets

/** HTTP front over [[StateQueries]] — the reference's Interactive Queries
  * REST surface (`utils/IQueriesService.java:78-176`, Jetty bootstrap at
  * :254-282, `utils/IQService.scala:11-17`), re-expressed over streaming
  * checkpoints with the JDK's built-in HTTP server (no extra deps).
  *
  * The reference's four GET shapes, same paths:
  *  - `GET /state/keyvalue/{store}/{key}`            — point lookup
  *  - `GET /state/keyvalues/{store}/all`             — full scan
  *  - `GET /state/keyvalues/{store}/range/{from}/{to}` — inclusive key range
  *  - `GET /state/windowed/{store}/{key}/{from}/{to}`  — per-key window
  *    fetch over [from, to] epoch-seconds, rendered `"$key@$windowStart"`
  *    (reference `IQueriesService.java:173`)
  *
  * What disappears vs the reference: the `MetadataService` key→host
  * routing and the cross-instance HTTP forward
  * (`IQueriesService.java:84-87,104-109`) — the driver addresses every
  * state partition, so every key is local by construction.
  *
  * Rows are rendered as a JSON array via Spark's own row-JSON encoder, so
  * any state schema is servable without bean classes.
  */
class StateHttpServer(spark: SparkSession, bindPort: Int = 0) {

  /** A queryable store: a (lazy) flattened state view + which of its
    * columns is the logical key and (for windowed stores) the window
    * start. `stateDf` is re-evaluated per request so reads see the
    * latest committed checkpoint batch. */
  private case class StoreConfig(stateDf: () => DataFrame, keyCol: String,
                                 winStartCol: Option[String])

  private val stores = scala.collection.concurrent.TrieMap.empty[String, StoreConfig]
  private var server: HttpServer = _
  private var boundPort: Int = bindPort

  /** Register a named store (reference `Materialized.as("counts-store")`,
    * `WordCount.java:56`) backed by `checkpoint`'s state, keyed by
    * `keyCol` of the flattened view; pass `winStartCol` for window
    * stores. */
  def register(name: String, checkpoint: String, keyCol: String,
               winStartCol: Option[String] = None): this.type = {
    registerView(name, () => StateQueries.flattened(spark, checkpoint), keyCol, winStartCol)
  }

  /** Register with an arbitrary state view — e.g. a projection of
    * [[StateQueries.flattened]] with friendlier column names. */
  def registerView(name: String, stateDf: () => DataFrame, keyCol: String,
                   winStartCol: Option[String] = None): this.type = {
    stores.put(name, StoreConfig(stateDf, keyCol, winStartCol))
    this
  }

  /** Start listening; returns the bound port (pass 0 for ephemeral). */
  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", bindPort), 0)
    server.createContext("/state", (ex: HttpExchange) => handle(ex))
    server.start()
    boundPort = server.getAddress.getPort
    boundPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def handle(ex: HttpExchange): Unit = {
    val resp =
      try route(ex.getRequestURI.getPath)
        .orElse(routeMetadata(ex.getRequestURI.getPath)) match {
        case Some(body) => (200, body)
        case None       => (404, """{"error":"unknown path or store"}""")
      } catch {
        case e: Throwable =>
          (500, s"""{"error":${quote(Option(e.getMessage).getOrElse(e.getClass.getName))}}""")
      }
    val bytes = resp._2.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(resp._1, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def segments(path: String): List[String] =
    path.stripPrefix("/").split("/").toList.map(p => URLDecoder.decode(p, "UTF-8"))

  private def route(path: String): Option[String] = segments(path) match {
    case "state" :: "keyvalue" :: store :: key :: Nil =>
      stores.get(store).map { cfg =>
        toJsonArray(
          StateQueries.point(cfg.stateDf(), col(cfg.keyCol).cast("string") === key))
      }
    case "state" :: "keyvalues" :: store :: "all" :: Nil =>
      stores.get(store).map(cfg => toJsonArray(StateQueries.all(cfg.stateDf())))
    case "state" :: "keyvalues" :: store :: "range" :: from :: to :: Nil =>
      stores.get(store).map { cfg =>
        toJsonArray(
          StateQueries.range(cfg.stateDf(), col(cfg.keyCol).cast("string"), from, to))
      }
    case "state" :: "windowed" :: store :: key :: from :: to :: Nil =>
      stores.get(store).flatMap { cfg =>
        cfg.winStartCol.map { ws =>
          toJsonArray(StateQueries.windowedFetch(cfg.stateDf(), col(cfg.keyCol),
            col(ws), key, from.toLong, to.toLong))
        }
      }
    case _ => None
  }

  /** Instance-metadata endpoints (reference
    * `IQueriesService.java:182-215`, `MetadataService.java:30-68`). On
    * Spark the topology degenerates to one driver that owns every store
    * and key, so the metadata answers are constant — kept so a reference
    * client's discovery flow works unchanged. */
  private def routeMetadata(path: String): Option[String] = {
    def instance(storeNames: Iterable[String]): String =
      s"""[{"host":"127.0.0.1","port":$boundPort,"stores":${
        storeNames.toSeq.sorted.map(quote).mkString("[", ",", "]")}}]"""
    segments(path) match {
      case "state" :: "instances" :: Nil =>
        Some(instance(stores.keys))
      case "state" :: "instances" :: store :: Nil =>
        stores.get(store).map(_ => instance(Seq(store)))
      case "state" :: "instance" :: store :: key :: Nil =>
        stores.get(store).map(_ =>
          s"""{"host":"127.0.0.1","port":$boundPort,"store":${quote(store)},"key":${quote(key)}}""")
      case _ => None
    }
  }

  /** Deterministic rendering: rows sorted by their JSON form so responses
    * are stable across partitionings. State stores are query-addressable
    * aggregates (bounded per store), not raw streams — collecting a
    * filtered read is the same driver-side materialization the reference
    * performs iterating its RocksDB store into a bean list. */
  private def toJsonArray(df: DataFrame): String =
    df.toJSON.collect().sorted.mkString("[", ",", "]")

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"").replaceAll("[\\r\\n\\t]", " ") + "\""
}
