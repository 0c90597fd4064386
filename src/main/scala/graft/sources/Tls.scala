package graft.sources

import java.io.{ByteArrayInputStream, File}
import java.security.KeyStore
import java.security.cert.{CertificateFactory, X509Certificate}
import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLParameters,
  TrustManagerFactory, X509TrustManager}

/** TLS/mTLS configuration — the reference's configtls surface
  * (config/configtls/configtls.go:1-357, behavior not code): PEM
  * `cert_file`/`key_file` for the local identity, `ca_file` for the
  * peer trust roots, server-side `client_auth` (mTLS: require AND
  * verify a client certificate), `min_version`/`max_version`
  * protocol bounds, and the client's `insecure_skip_verify` escape
  * hatch. Assembled into JDK [[javax.net.ssl.SSLContext]]s — no
  * library beyond the JDK.
  *
  * Key files are PKCS#8 PEM (`BEGIN PRIVATE KEY`); certificates and
  * CA bundles are standard X.509 PEM (multi-cert bundles supported —
  * CertificateFactory consumes them sequentially).
  */
final case class TlsConfig(
    certFile: String = "",
    keyFile: String = "",
    caFile: String = "",
    clientAuth: Boolean = false,
    minVersion: String = "TLSv1.2",
    maxVersion: String = "TLSv1.3",
    insecureSkipVerify: Boolean = false) {

  /** protocol list within [minVersion, maxVersion] — the JDK takes
    * an explicit enabled-protocol set, not a range */
  def protocols: Array[String] = {
    val order = Seq("TLSv1", "TLSv1.1", "TLSv1.2", "TLSv1.3")
    val lo = order.indexOf(minVersion)
    val hi = order.indexOf(maxVersion)
    require(lo >= 0, s"unknown min_version: $minVersion")
    require(hi >= lo, s"max_version $maxVersion below min_version $minVersion")
    order.slice(lo, hi + 1).toArray
  }

  def sslContext(): SSLContext = {
    val kms = if (certFile.nonEmpty) {
      val ks = KeyStore.getInstance("PKCS12")
      ks.load(null, null)
      val chain = Tls.readCerts(certFile)
      val key = Tls.readPkcs8Key(keyFile)
      ks.setKeyEntry("identity", key, Array.emptyCharArray,
        chain.toArray[java.security.cert.Certificate])
      val kmf = KeyManagerFactory.getInstance(
        KeyManagerFactory.getDefaultAlgorithm)
      kmf.init(ks, Array.emptyCharArray)
      kmf.getKeyManagers
    } else null
    val tms =
      if (insecureSkipVerify) Array[javax.net.ssl.TrustManager](Tls.trustAll)
      else if (caFile.nonEmpty) {
        val ts = KeyStore.getInstance("PKCS12")
        ts.load(null, null)
        Tls.readCerts(caFile).zipWithIndex.foreach { case (c, i) =>
          ts.setCertificateEntry(s"ca$i", c)
        }
        val tmf = TrustManagerFactory.getInstance(
          TrustManagerFactory.getDefaultAlgorithm)
        tmf.init(ts)
        tmf.getTrustManagers
      } else null // JDK default trust roots
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kms, tms, null)
    ctx
  }

  /** server-side parameters: protocol bounds + mTLS client auth */
  def serverParameters(base: SSLParameters): SSLParameters = {
    base.setProtocols(protocols)
    if (clientAuth) base.setNeedClientAuth(true)
    base
  }
}

object Tls {
  /** parse a PEM file holding one or more X.509 certificates */
  def readCerts(path: String): Seq[X509Certificate] = {
    val cf = CertificateFactory.getInstance("X.509")
    val bytes = java.nio.file.Files.readAllBytes(new File(path).toPath)
    val in = new ByteArrayInputStream(bytes)
    val out = scala.collection.mutable.ArrayBuffer[X509Certificate]()
    while (in.available() > 0) {
      // CertificateFactory stops at each PEM boundary; guard against
      // trailing whitespace after the last block
      try out += cf.generateCertificate(in).asInstanceOf[X509Certificate]
      catch { case _: java.security.cert.CertificateException =>
        in.skip(in.available().toLong); () }
    }
    require(out.nonEmpty, s"no certificates in $path")
    out.toSeq
  }

  /** parse a PKCS#8 PEM private key (`BEGIN PRIVATE KEY`); tries RSA
    * then EC — the two keytool/openssl defaults */
  def readPkcs8Key(path: String): java.security.PrivateKey = {
    val pem = new String(
      java.nio.file.Files.readAllBytes(new File(path).toPath), "US-ASCII")
    val b64 = pem.linesIterator
      .filterNot(l => l.startsWith("-----") || l.trim.isEmpty)
      .mkString
    val der = java.util.Base64.getDecoder.decode(b64)
    val spec = new java.security.spec.PKCS8EncodedKeySpec(der)
    Seq("RSA", "EC").view.flatMap { alg =>
      try Some(java.security.KeyFactory.getInstance(alg).generatePrivate(spec))
      catch { case _: java.security.spec.InvalidKeySpecException => None }
    }.headOption.getOrElse(throw new IllegalArgumentException(
      s"unsupported private key in $path (PKCS#8 RSA/EC expected)"))
  }

  private[sources] val trustAll: X509TrustManager = new X509TrustManager {
    def checkClientTrusted(c: Array[X509Certificate], a: String): Unit = ()
    def checkServerTrusted(c: Array[X509Certificate], a: String): Unit = ()
    def getAcceptedIssuers: Array[X509Certificate] = Array.empty
  }

  /** hostname verifier for insecure_skip_verify */
  private[sources] val anyHost: javax.net.ssl.HostnameVerifier =
    (_: String, _: javax.net.ssl.SSLSession) => true

  /** Generate a self-signed identity (PEM cert + PKCS#8 key) for
    * localhost loopback — dev/test deployments where no CA exists
    * (the configtls docs' self-signed path). Shells to the JDK's own
    * `keytool` (present wherever the JVM is), then exports the pair
    * to PEM so the [[TlsConfig]] PEM surface is exercised end-to-end.
    * Returns (certFile, keyFile). */
  def generateSelfSigned(dir: String, cn: String = "localhost"): (String, String) = {
    val d = new File(dir); d.mkdirs()
    val ksFile = new File(d, s"$cn.p12")
    val javaHome = System.getProperty("java.home")
    val keytool = new File(new File(javaHome, "bin"), "keytool").getAbsolutePath
    val cmd = Seq(keytool, "-genkeypair", "-alias", "id", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "7", "-storetype", "PKCS12",
      "-keystore", ksFile.getAbsolutePath, "-storepass", "changeit",
      "-dname", s"CN=$cn",
      "-ext", s"SAN=dns:$cn,ip:127.0.0.1")
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    require(p.waitFor() == 0, s"keytool failed: $out")
    val ks = KeyStore.getInstance("PKCS12")
    val fin = new java.io.FileInputStream(ksFile)
    try ks.load(fin, "changeit".toCharArray) finally fin.close()
    val cert = ks.getCertificate("id")
    val key = ks.getKey("id", "changeit".toCharArray)
      .asInstanceOf[java.security.PrivateKey]
    def pem(label: String, der: Array[Byte]): String =
      s"-----BEGIN $label-----\n" +
        java.util.Base64.getMimeEncoder(64, "\n".getBytes)
          .encodeToString(der) + s"\n-----END $label-----\n"
    val certFile = new File(d, s"$cn-cert.pem")
    val keyFile = new File(d, s"$cn-key.pem")
    java.nio.file.Files.write(certFile.toPath,
      pem("CERTIFICATE", cert.getEncoded).getBytes("US-ASCII"))
    java.nio.file.Files.write(keyFile.toPath,
      pem("PRIVATE KEY", key.getEncoded).getBytes("US-ASCII"))
    (certFile.getAbsolutePath, keyFile.getAbsolutePath)
  }

  /** SSLSocketFactory wrapper that pins every created socket to the
    * config's protocol range — HttpsURLConnection offers everything
    * the context supports otherwise, ignoring min/max_version */
  final class BoundedSocketFactory(delegate: javax.net.ssl.SSLSocketFactory,
      protocols: Array[String]) extends javax.net.ssl.SSLSocketFactory {
    private def bound(s: java.net.Socket): java.net.Socket = {
      s.asInstanceOf[javax.net.ssl.SSLSocket].setEnabledProtocols(protocols)
      s
    }
    override def getDefaultCipherSuites: Array[String] =
      delegate.getDefaultCipherSuites
    override def getSupportedCipherSuites: Array[String] =
      delegate.getSupportedCipherSuites
    override def createSocket(): java.net.Socket =
      bound(delegate.createSocket())
    override def createSocket(s: java.net.Socket, host: String, port: Int,
        autoClose: Boolean): java.net.Socket =
      bound(delegate.createSocket(s, host, port, autoClose))
    override def createSocket(host: String, port: Int): java.net.Socket =
      bound(delegate.createSocket(host, port))
    override def createSocket(host: String, port: Int,
        localHost: java.net.InetAddress, localPort: Int): java.net.Socket =
      bound(delegate.createSocket(host, port, localHost, localPort))
    override def createSocket(host: java.net.InetAddress,
        port: Int): java.net.Socket =
      bound(delegate.createSocket(host, port))
    override def createSocket(address: java.net.InetAddress, port: Int,
        localAddress: java.net.InetAddress, localPort: Int): java.net.Socket =
      bound(delegate.createSocket(address, port, localAddress, localPort))
  }

  /** TLS client socket for the line-framed loopback transports (the
    * sender half of a TLS [[ArrowIpc.ArrowAdmissionGateway]]) */
  def clientSocket(cfg: TlsConfig, host: String, port: Int): javax.net.ssl.SSLSocket = {
    val s = cfg.sslContext().getSocketFactory.createSocket(host, port)
      .asInstanceOf[javax.net.ssl.SSLSocket]
    val p = s.getSSLParameters
    p.setProtocols(cfg.protocols)
    if (!cfg.insecureSkipVerify)
      p.setEndpointIdentificationAlgorithm("HTTPS")
    s.setSSLParameters(p)
    s
  }

  /** config-block parser: `tls: {cert_file, key_file, ca_file,
    * client_auth, min_version, max_version, insecure_skip_verify}` */
  def fromMap(m: Map[String, Object]): TlsConfig = TlsConfig(
    certFile = m.get("cert_file").map(_.toString).getOrElse(""),
    keyFile = m.get("key_file").map(_.toString).getOrElse(""),
    caFile = m.get("ca_file").map(_.toString).getOrElse(""),
    clientAuth = m.get("client_auth").exists(_.toString.toBoolean),
    minVersion = m.get("min_version").map(_.toString).getOrElse("TLSv1.2"),
    maxVersion = m.get("max_version").map(_.toString).getOrElse("TLSv1.3"),
    insecureSkipVerify =
      m.get("insecure_skip_verify").exists(_.toString.toBoolean))
}
