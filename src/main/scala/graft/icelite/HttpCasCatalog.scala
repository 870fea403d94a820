package graft.icelite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Object-store catalog over REAL HTTP: the commit pointer is an object
  * per version, published with a CONDITIONAL PUT (`If-None-Match: *`) —
  * the exact primitive S3 (conditional writes, GA 2024-08), MinIO and
  * GCS (`x-goog-if-generation-match: 0`, also honored as a 412/409
  * precondition failure) expose. This is [[CasCatalog]]'s protocol on
  * the wire instead of an in-memory map: two committers that both loaded
  * version N−1 race their PUTs of version N; the store accepts exactly
  * one and answers 412 (or 409) to the loser, who rebases — no rename,
  * no lock, no hint file required for correctness.
  *
  * Deployment notes, kept honest:
  *  - Auth is injected via the `headers` thunk (bearer tokens, presigned
  *    headers). AWS SigV4 request signing is a pure function of
  *    (request, credentials) a deployment wraps around [[req]]; it is
  *    not implemented here because this zero-egress sandbox has neither
  *    credentials nor an endpoint to validate against — the spec drives
  *    the protocol against an in-process HTTP server with object-store
  *    conditional-PUT semantics instead (HttpCasCatalogSpec, including
  *    racing committers through real sockets).
  *  - Only METADATA versions go through the catalog. Data files and
  *    manifests are immutable and uniquely named per attempt, so plain
  *    PUTs suffice wherever they live (a lost race only orphans them).
  *  - `currentVersion` makes no LIST API call: it gallops (doubling
  *    steps) from the last version this instance saw, then binary-
  *    searches the exists/missing boundary — O(log N) HEADs from a cold
  *    start, O(1) warm, relying only on versions being DENSE at the top
  *    (snapshot expiry removes old versions, never recent ones).
  *    Caveat: probing needs a true 404 for missing keys — on S3 that
  *    still requires the `s3:ListBucket` *permission* (without it S3
  *    answers 403 for missing keys, which this class treats as a hard
  *    error rather than guessing); GCS/MinIO 404 regardless.
  */
class HttpCasCatalog(endpoint: String,
    headers: () => Map[String, String] = () => Map.empty,
    client: HttpClient = HttpClient.newHttpClient()) extends Catalog {

  private def key(dir: String, v: Int): String =
    java.net.URLEncoder.encode(s"$dir/v$v.metadata.json", "UTF-8")

  private def uri(dir: String, v: Int): URI =
    URI.create(s"${endpoint.stripSuffix("/")}/${key(dir, v)}")

  private def req(u: URI): HttpRequest.Builder = {
    val b = HttpRequest.newBuilder(u)
    headers().foreach { case (k, v) => b.header(k, v) }
    b
  }

  /** Last version this instance observed per dir — a warm-start hint for
    * the galloping probe, never trusted beyond "known to have existed".
    */
  private val seen = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private def noteSeen(dir: String, v: Int): Unit =
    seen.merge(dir, Integer.valueOf(v), (a, b) => if (a >= b) a else b)

  private def hintUri(dir: String): URI = URI.create(
    s"${endpoint.stripSuffix("/")}/${java.net.URLEncoder
      .encode(s"$dir/version-hint.text", "UTF-8")}")

  override def tryPublish(dir: String, v: Int, bytes: Array[Byte]): Boolean = {
    val r = req(uri(dir, v))
      .header("If-None-Match", "*")
      .PUT(HttpRequest.BodyPublishers.ofByteArray(bytes))
      .build()
    val code = client.send(r, HttpResponse.BodyHandlers.discarding()).statusCode()
    code match {
      case c if c / 100 == 2 =>
        noteSeen(dir, v)
        // hint OBJECT (unconditional PUT — same contract as
        // FileCatalog's version-hint.text): keeps cold-start
        // currentVersion O(log gap) even after snapshot expiry deletes
        // v1, and its PRESENCE is load-bearing for exists() after v1
        // expires (ADVICE r5) — so the winner RETRIES the PUT a few
        // times (transient 5xx/IO) instead of shrugging once. Ultimate
        // failure is still swallowed: the commit itself already
        // published, and readers recover by probing.
        var attempt = 0
        var hintWritten = false
        while (!hintWritten && attempt < 3) {
          attempt += 1
          try {
            val hc = client.send(req(hintUri(dir))
                .PUT(HttpRequest.BodyPublishers.ofString(v.toString)).build(),
              HttpResponse.BodyHandlers.discarding()).statusCode()
            hintWritten = hc / 100 == 2
          } catch {
            case _: java.io.IOException => ()
            // retried best-effort, but a swallowed interrupt would drop
            // a task kill — restore the flag and stop retrying
            case _: InterruptedException =>
              Thread.currentThread().interrupt(); attempt = 3
          }
        }
        true
      // 412 Precondition Failed (S3/MinIO), 409 Conflict (GCS): the
      // object exists — a concurrent committer won the CAS
      case 412 | 409 => false
      case c => throw new java.io.IOException(
        s"catalog PUT ${uri(dir, v)} failed: HTTP $c")
    }
  }

  override def readVersion(dir: String, v: Int): Array[Byte] = {
    val r = req(uri(dir, v)).GET().build()
    val resp = client.send(r, HttpResponse.BodyHandlers.ofByteArray())
    resp.statusCode() match {
      case c if c / 100 == 2 => resp.body()
      // NoSuchFileException, deliberately: readers (versionAt, expiry
      // walks) classify MISSING as expired history and rethrow real IO
      // errors — same contract as FileCatalog
      case 404 => throw new java.nio.file.NoSuchFileException(
        uri(dir, v).toString)
      case c => throw new java.io.IOException(
        s"catalog GET ${uri(dir, v)} failed: HTTP $c")
    }
  }

  override def versionExists(dir: String, v: Int): Boolean = {
    val r = req(uri(dir, v))
      .method("HEAD", HttpRequest.BodyPublishers.noBody()).build()
    val code = client.send(r, HttpResponse.BodyHandlers.discarding()).statusCode()
    if (code / 100 == 2) { noteSeen(dir, v); true }
    else if (code == 404) false
    else throw new java.io.IOException(
      s"catalog HEAD ${uri(dir, v)} failed: HTTP $code")
  }

  /** The stored hint object's value, or None (missing / unreadable —
    * hints are caches, never required).
    */
  private def storedHint(dir: String): Option[Int] =
    try {
      val resp = client.send(req(hintUri(dir)).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 == 2) resp.body().trim.toIntOption else None
    } catch {
      case _: java.io.IOException => None
      case _: InterruptedException =>
        Thread.currentThread().interrupt(); None
    }

  /** How far PAST a stale hint the recovery probe walks before giving
    * up. Hints are written on every publish, so real lag is tiny; the
    * bound only exists so a lost-hint pathological table fails loudly
    * instead of HEAD-probing forever.
    */
  private val maxHintLag = 256

  override def currentVersion(dir: String): Int = {
    // start from a version known to have existed: warm in-memory hint,
    // else the stored hint object, else 1
    val hinted = Option(seen.get(dir)).map(_.intValue())
      .orElse(storedHint(dir))
    var lo = math.max(1, hinted.getOrElse(1))
    if (!versionExists(dir, lo)) {
      // No hint anywhere AND no v1: a never-created table, by
      // convention (like FileCatalog). Return immediately — the forward
      // probe below exists to recover from a STALE hint, which requires
      // a hint to have existed; walking it here made every read of a
      // missing table pay 257 sequential HEAD round trips against a
      // real object store (ADVICE r5). Winners retry the hint PUT (see
      // tryPublish), so a created table losing EVERY hint write AND its
      // v1 to expiry is operator-error territory, not a probe target.
      if (hinted.isEmpty) return 1
      // the hinted version is gone: expiry removed it while the hint
      // lagged (out-of-order best-effort hint PUTs). Recover by probing
      // FORWARD — the Catalog contract is "probe forward, never trust a
      // stale pointer": live versions can only be AHEAD of a stale hint
      // (hints are written after their version exists and expiry
      // removes only the oldest).
      (lo + 1 to lo + maxHintLag).find(versionExists(dir, _)) match {
        case Some(v) => lo = v
        case None if lo != 1 && versionExists(dir, 1) => lo = 1
        case None =>
          // a hint exists, so the table WAS created, but nothing is
          // loadable near it — fail loudly instead of returning a
          // version known to be missing (which would read as an
          // irrecoverably broken/empty table)
          seen.remove(dir)
          throw new java.io.IOException(
            s"catalog: hint for $dir points at v${hinted.get} but no " +
              s"live version exists within $maxHintLag above it — " +
              "hint object lost or lagging; restore it or re-commit")
      }
    }
    // gallop: exists(lo) holds; find the first missing version above —
    // versions are dense in [lo, N] (expiry removes only the oldest)
    var step = 1
    while (versionExists(dir, lo + step)) { lo += step; step *= 2 }
    var hi = lo + step // missing
    while (hi - lo > 1) {
      val mid = lo + (hi - lo) / 2
      if (versionExists(dir, mid)) lo = mid else hi = mid
    }
    noteSeen(dir, lo)
    lo
  }

  // the hint object is only ever written AFTER a successful version
  // publish, so its mere presence proves the table was created — this
  // keeps `exists` true after snapshot expiry removes v1 (a false
  // negative here would let a create-if-absent flow publish a fresh v1
  // and shadow the live table)
  override def exists(dir: String): Boolean = versionExists(dir, 1) ||
    Option(seen.get(dir)).exists(v => versionExists(dir, v.intValue())) ||
    storedHint(dir).isDefined
}
