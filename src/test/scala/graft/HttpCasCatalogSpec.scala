package graft

import graft.icelite.{HttpCasCatalog, IceLite}
import org.apache.spark.sql.types._

/** The HTTP conditional-PUT catalog, driven over REAL sockets against an
  * in-process object-store mock (JDK HttpServer) implementing S3-style
  * semantics: `PUT` with `If-None-Match: *` answers 412 when the key
  * exists (atomically — one winner per key), plain PUT overwrites, GET
  * 200/404, HEAD 200/404. Proves the engine's whole commit protocol —
  * create, racing committers, galloping currentVersion, hint recovery —
  * needs nothing beyond that wire primitive.
  */
class HttpCasCatalogSpec extends SparkTestBase {

  /** Minimal object store over HTTP. Conditional create is synchronized
    * on the object map, exactly as an object store's per-key CAS is.
    */
  private def withServer(f: (String, java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]) => Unit): Unit = {
    val objects = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { ex =>
      val key = ex.getRequestURI.getPath.stripPrefix("/")
      ex.getRequestMethod match {
        case "PUT" =>
          val body = ex.getRequestBody.readAllBytes()
          val conditional =
            Option(ex.getRequestHeaders.getFirst("If-None-Match")).contains("*")
          val created =
            if (conditional) objects.putIfAbsent(key, body) == null
            else { objects.put(key, body); true }
          ex.sendResponseHeaders(if (created) 200 else 412, -1)
        case "GET" =>
          val b = objects.get(key)
          if (b == null) ex.sendResponseHeaders(404, -1)
          else {
            ex.sendResponseHeaders(200, b.length)
            ex.getResponseBody.write(b)
          }
        case "HEAD" =>
          // HttpServer requires -1 (no body) for HEAD responses
          ex.sendResponseHeaders(if (objects.containsKey(key)) 200 else 404, -1)
        case _ => ex.sendResponseHeaders(405, -1)
      }
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", objects)
    finally server.stop(0)
  }

  private val struct = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("v", LongType, nullable = true)))

  test("conditional PUT CAS over the wire: racing committers produce " +
      "exactly one winner per version; losers rebase via the retry loop") {
    withServer { (endpoint, _) =>
      val cat = new HttpCasCatalog(endpoint)
      val dir = tmpDir("httpcas")
      IceLite.create(dir, struct, numBuckets = 2, cat)
      // 8 threads race DISTINCT epochs; every commit must land exactly
      // once and the version chain must stay dense
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ts = (0 until 8).map { i =>
        new Thread(() =>
          try IceLite.commit(dir, s"race-$i", "test", catalog = cat)
          catch { case t: Throwable => errs.add(t) })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      assert(errs.isEmpty, errs.toString)
      val m = IceLite.load(dir, cat)
      assert(m.version == 9) // create + 8 commits
      assert((0 until 8).forall(i => m.committedEpoch(s"race-$i")))
      // raw CAS: same version from two writers — one true, one false
      val ok1 = cat.tryPublish(dir + "-raw", 1, "a".getBytes)
      val ok2 = cat.tryPublish(dir + "-raw", 1, "b".getBytes)
      assert(ok1 && !ok2)
      assert(new String(cat.readVersion(dir + "-raw", 1)) == "a")
    }
  }

  test("currentVersion on a never-created table answers 1 immediately — " +
      "no 257-probe forward walk (ADVICE r5)") {
    withServer { (endpoint, _) =>
      // the headers thunk runs once per request built — a request counter
      val n = new java.util.concurrent.atomic.AtomicInteger
      val cat = new HttpCasCatalog(endpoint,
        () => { n.incrementAndGet(); Map.empty })
      assert(cat.currentVersion("/tbl/never-created") == 1)
      // stored-hint GET + v1 HEAD only; the forward probe (256 more
      // sequential HEAD round trips) must not run without a hint
      assert(n.get() <= 3, s"made ${n.get()} requests")
      assert(!cat.exists("/tbl/never-created"))
    }
  }

  test("currentVersion gallops to the newest version from a cold start, " +
      "recovers via the hint object after low versions expire, and an " +
      "idempotent replayed epoch no-ops") {
    withServer { (endpoint, objects) =>
      val cat = new HttpCasCatalog(endpoint)
      val dir = tmpDir("httpgallop")
      IceLite.create(dir, struct, numBuckets = 2, cat)
      (1 to 20).foreach(i => IceLite.commit(dir, s"e-$i", "test", catalog = cat))
      // a COLD instance (empty in-memory hint) must find v21; delete the
      // hint object first so the doubling gallop + binary search probe is
      // what actually finds it (1→2→4→8→16→32-miss, then bisect to 21)
      val hintKey = objects.keySet().stream().filter(k =>
        java.net.URLDecoder.decode(k, "UTF-8").endsWith("/version-hint.text"))
        .toArray
      hintKey.foreach(k => objects.remove(k))
      val cold = new HttpCasCatalog(endpoint)
      assert(cold.currentVersion(dir) == 21)
      // restore the hint for the expiry-recovery case below
      IceLite.commit(dir, "e-hint", "test", catalog = cat)
      // expire versions 1..15 store-side (what snapshot expiry does);
      // a fresh instance recovers through the stored hint object
      val gone = objects.keySet().stream().filter(k =>
        (1 to 15).exists(v => java.net.URLDecoder.decode(k, "UTF-8")
          .endsWith(s"/v$v.metadata.json"))).toArray
      gone.foreach(k => objects.remove(k))
      val afterExpiry = new HttpCasCatalog(endpoint)
      assert(afterExpiry.currentVersion(dir) == 22) // incl. the e-hint commit
      assert(afterExpiry.exists(dir))
      // STALE hint pointing at an expired version (out-of-order
      // best-effort hint PUTs): recovery probes FORWARD, never returns a
      // version known to be missing
      val hintK = objects.keySet().stream().filter(k =>
        java.net.URLDecoder.decode(k, "UTF-8").endsWith("/version-hint.text"))
        .toArray
      hintK.foreach(k => objects.put(k.toString, "3".getBytes)) // v3 expired
      val staleHint = new HttpCasCatalog(endpoint)
      assert(staleHint.currentVersion(dir) == 22)
      assert(staleHint.exists(dir))
      // replayed epoch: committed-epoch check happens before any publish
      val v = IceLite.commit(dir, "e-20", "test", catalog = cat).version
      assert(v == 22, "replayed epoch must no-op")
      // a hint pointing FAR past anything live (lost versions, corrupt
      // hint): fail loudly, never return a version known to be missing
      hintK.foreach(k => objects.put(k.toString, "9000".getBytes))
      val broken = new HttpCasCatalog(endpoint)
      val e = intercept[java.io.IOException] { broken.currentVersion(dir) }
      assert(e.getMessage.contains("hint"), e.getMessage)
    }
  }
}
