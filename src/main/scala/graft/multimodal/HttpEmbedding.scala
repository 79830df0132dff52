package graft.multimodal

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/** Reference-shaped HTTP embedding provider (VERDICT r4 item 8; reference:
  * src/ml/auto_embed.rs:44-140 — the OpenAI/Cohere/Ollama providers all
  * speak the same POST-a-batch / get-vectors-back shape). This is the one
  * real-provider skeleton behind [[Multimodal.EmbeddingBackend]]:
  *
  *   request  `{"model": <model>, "input": [<text>, ...]}`
  *   response `{"data": [{"index": i, "embedding": [f32, ...]}, ...]}`
  *
  * (the OpenAI `/v1/embeddings` wire format, which Ollama and most
  * self-hosted servers also accept). Transport is the JDK's HttpClient —
  * no new dependencies — with the reference's bounded retry-on-429/5xx
  * loop. Integration-gated: nothing in the hermetic build calls the
  * network; HttpEmbeddingSpec drives it against an in-process stub server.
  *
  * Scale shape: the backend rides inside [[Multimodal.autoEmbedWith]]'s
  * mapPartitions closure — one HTTP call per `batchSize` rows per
  * partition, the amortization unit every provider bills by. The client
  * is `@transient lazy`, built once per executor task, never serialized.
  */
final case class HttpEmbeddingBackend(
    endpoint: String,                    // e.g. http://host:8080/v1/embeddings
    model: String,
    dims: Int,
    apiKey: Option[String] = None,       // sent as `Authorization: Bearer …`
    timeoutMs: Long = 30000L,
    maxRetries: Int = 3,
    retryBackoffMs: Long = 200L) extends Multimodal.EmbeddingBackend {

  val name = s"http:$model"

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs)).build()
  @transient private lazy val mapper = new ObjectMapper()

  private def requestBody(texts: Seq[String]): String = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    val arr = root.putArray("input")
    texts.foreach(arr.add)
    mapper.writeValueAsString(root)
  }

  /** Parse `data[*].embedding` honoring `index` (providers may reorder). */
  private def parseResponse(body: String, n: Int): Array[Array[Float]] = {
    val root = mapper.readTree(body)
    val data = root.get("data")
    require(data != null && data.isArray,
      s"embedding response missing data array: ${body.take(200)}")
    val out = new Array[Array[Float]](n)
    val it = data.elements()
    var pos = 0
    while (it.hasNext) {
      val el = it.next()
      val idx = if (el.has("index")) el.get("index").asInt() else pos
      val emb = el.get("embedding")
      require(emb != null && emb.isArray,
        s"embedding response entry missing embedding: ${el.toString.take(200)}")
      require(idx >= 0 && idx < n,
        s"embedding response index $idx out of range for batch of $n")
      require(out(idx) == null,
        s"embedding response contains duplicate index $idx")
      val v = new Array[Float](emb.size())
      var j = 0
      while (j < emb.size()) { v(j) = emb.get(j).floatValue(); j += 1 }
      require(v.length == dims,
        s"provider returned ${v.length} dims, expected $dims")
      out(idx) = v
      pos += 1
    }
    // a short response would otherwise surface as null vectors for
    // non-null inputs — indistinguishable from the null-content contract
    require(pos == n,
      s"embedding response returned $pos entries for a batch of $n")
    out
  }

  private def post(body: String): String = {
    var builder = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
    apiKey.foreach(k => builder = builder.header("Authorization", s"Bearer $k"))
    val req = builder
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      if (attempt > 0) Thread.sleep(retryBackoffMs * attempt) // linear backoff
      try {
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        resp.statusCode() match {
          case ok if ok / 100 == 2 => return resp.body()
          case retryable if retryable == 429 || retryable / 100 == 5 =>
            lastErr = new RuntimeException(
              s"embedding provider HTTP $retryable: ${resp.body().take(200)}")
          case fatal =>
            throw new RuntimeException(
              s"embedding provider HTTP $fatal: ${resp.body().take(200)}")
        }
      } catch {
        case e: java.io.IOException => lastErr = e // connection-level: retry
      }
      attempt += 1
    }
    throw new RuntimeException(
      s"embedding request failed after ${maxRetries + 1} attempts", lastErr)
  }

  /** One model call per batch; null content → null vector (the backend
    * contract). Null/empty batches never reach the wire.
    */
  def embedBatch(contents: Seq[Array[Byte]]): Seq[Array[Float]] = {
    val texts = contents.map(c =>
      if (c == null) null else new String(c, StandardCharsets.UTF_8))
    val live = texts.zipWithIndex.filter(_._1 != null)
    if (live.isEmpty) return contents.map(_ => null)
    val vecs = parseResponse(post(requestBody(live.map(_._1))), live.size)
    val out = new Array[Array[Float]](contents.size)
    live.zipWithIndex.foreach { case ((_, origIdx), liveIdx) =>
      out(origIdx) = vecs(liveIdx)
    }
    out.toSeq
  }
}
