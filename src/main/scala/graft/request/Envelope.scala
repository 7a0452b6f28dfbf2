package graft.request

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.model.JobState
import org.apache.spark.sql.SparkSession

import scala.util.control.NonFatal

/** Service-entrypoint envelope — the transport-neutral analog of the
  * reference's Lambda front door (entrypoints/aws_lambda.py:108-236):
  *
  *  - envelope parsing: an ALB/API-gateway-shaped event carries the
  *    request as a JSON string `body` with `isBase64Encoded`; a raw
  *    (un-enveloped) request is accepted as the fallback, and when BOTH
  *    fail the 400 carries both validation errors, keyed like the
  *    reference's BadRequest payload;
  *  - secret resolution: `connection.secret` names an entry in a
  *    pluggable [[SecretResolver]] (the AWS SecretsManager call is a
  *    deployment concern — the registry is the RESOLVE_SECRETS gate:
  *    no resolver registered ⇒ passing a secret is a request error);
  *  - HTTP response shaping: `{statusCode, headers, body}` with
  *    200 for handled requests, 400 for validation failures, 500 when
  *    the engine itself fails.
  */
object Envelope {
  private val mapper = new ObjectMapper()

  /** Deployment hook resolving a secret name to connection fields
    * (username/password/url… — here source/target coordinates). */
  trait SecretResolver {
    def resolve(name: String): Map[String, String]
  }

  @volatile private var resolver: Option[SecretResolver] = None
  /** Install the deployment's secret backend; None disables (default). */
  def setSecretResolver(r: Option[SecretResolver]): Unit = resolver = r

  case class HttpResponse(statusCode: Int, headers: Map[String, String],
      body: String) {
    def toJson: String = {
      val root = mapper.createObjectNode()
      root.put("statusCode", statusCode)
      val h = root.putObject("headers")
      headers.foreach { case (k, v) => h.put(k, v) }
      root.put("body", body)
      root.put("isBase64Encoded", false)
      mapper.writeValueAsString(root)
    }
  }

  private val JsonHeaders = Map("Content-Type" -> "application/json")

  private def respond(status: Int, bodyJson: String): HttpResponse =
    HttpResponse(status, JsonHeaders, bodyJson)

  private def errorBody(fields: (String, String)*): String = {
    val root = mapper.createObjectNode()
    fields.foreach { case (k, v) => root.put(k, v) }
    mapper.writeValueAsString(root)
  }

  /** Unwrap an enveloped event to its request JSON: `body` (string,
    * optionally base64) when present, the event itself otherwise. */
  private[request] def unwrap(eventJson: String): String = {
    val root = mapper.readTree(eventJson)
    Option(root.get("body")).filterNot(_.isNull) match {
      case Some(b) =>
        val raw = b.asText
        if (Option(root.get("isBase64Encoded")).exists(_.asBoolean(false)))
          new String(java.util.Base64.getDecoder.decode(raw.trim), "UTF-8")
        else raw
      case None => eventJson
    }
  }

  /** Merge `connection.secret` fields through the registered resolver
    * (ConnectWithSecretModel analog, aws_lambda.py:108-130). Throws
    * IllegalArgumentException when a secret is passed with no resolver
    * installed, or the resolver fails. */
  private[request] def resolveSecrets(requestJson: String): String = {
    val root = mapper.readTree(requestJson)
    val conn = Option(root.get("connection")).collect {
      case o: ObjectNode => o }
    val secret = conn.flatMap(c =>
      Option(c.get("secret")).filterNot(_.isNull).map(_.asText))
    (conn, secret) match {
      case (Some(c), Some(name)) =>
        val r = resolver.getOrElse(throw new IllegalArgumentException(
          "A connection secret was passed but no secret resolver is " +
            "installed (RESOLVE_SECRETS analog)"))
        val fields =
          try r.resolve(name)
          catch { case NonFatal(e) => throw new IllegalArgumentException(
            s"Failed to fetch or parse secret: $name reason: $e") }
        fields.foreach { case (k, v) => c.put(k, v) }
        c.remove("secret")
        mapper.writeValueAsString(root)
      case _ => requestJson
    }
  }

  /** Full front-door dispatch: envelope → secrets → Protocol → HTTP. */
  def handle(spark: SparkSession, eventJson: String): HttpResponse = {
    // stage 1: envelope, falling back to a raw request (the reference
    // retries raw validation and reports BOTH failures on a 400)
    val unwrapped =
      try Right(unwrap(eventJson))
      catch { case NonFatal(e) => Left(e) }
    unwrapped match {
      case Left(envelopeErr) =>
        respond(400, errorBody(
          "RawValidationException" -> "event is not valid JSON",
          "EnvelopeValidationException" -> envelopeErr.toString))
      case Right(requestJson) =>
        val prepared =
          try Right(resolveSecrets(requestJson))
          catch { case NonFatal(e) => Left(e) }
        prepared match {
          case Left(secretErr) =>
            respond(400, errorBody("exception" -> secretErr.toString))
          case Right(json) =>
            val resp = Protocol.handle(spark, json)
            // HTTPException mapping (aws_lambda.py:96-106): bad requests
            // 400, unknown jobs 404, engine failures 500, handled 200.
            val badReq = Seq("BadRequest", "UsageError", "InvalidObjectType",
              "IllegalArgumentException")
            val status =
              if (resp.error.isEmpty) 200
              else if (resp.state == JobState.NotRunning.name) 404
              else if (resp.error.exists(e => badReq.exists(e.contains))) 400
              else 500
            respond(status, resp.toJson)
        }
    }
  }
}
