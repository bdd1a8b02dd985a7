package graft.etl

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Driver-side HTTP access for the extract path (reference operators A1/A2,
  * /root/reference/dags/crypto-etl-pipeline-psql.py:143-179).
  *
  * Deliberately NOT a dataflow op: the reference polls one tiny payload per
  * run, so the fetch happens on the driver before any executor is involved
  * (the Spark analogue of the sensor's reschedule mode — no cluster
  * resources held while waiting). For high-volume ingest the landing-zone
  * pattern in [[Ingest.readPricesJson]] takes over.
  */
object Http {
  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .build()

  /** GET a URL; returns (status, body). */
  def get(url: String, timeoutSeconds: Long = 30): (Int, String) = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(timeoutSeconds))
      .GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  /** A1 availability predicate: HTTP 200 and the body contains `marker`
    * (the reference checks for "gecko" in the ping response at :147).
    * Network errors read as unavailable, never thrown — combine with
    * [[Ingest.preflight]] for the bounded retry loop. */
  def available(url: String, marker: String): Boolean =
    try {
      val (code, body) = get(url, timeoutSeconds = 10)
      code == 200 && body.contains(marker)
    } catch { case _: Exception => false }
}
