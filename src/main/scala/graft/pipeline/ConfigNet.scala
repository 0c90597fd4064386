package graft.pipeline

import java.io.{InputStream, OutputStream}

/** config/confignet analog: the `transport` knob on socket endpoints
  * (confignet.go NetAddr.Transport). graft's stream components speak
  * two of the reference's transports: `tcp` (with the tcp4/tcp6
  * aliases — graft binds loopback, where the distinction is moot)
  * and `unix` (an AF_UNIX stream socket at a filesystem path, via
  * java.net.UnixDomainSocketAddress — JDK 16+). The datagram shapes
  * (udp/unixgram/ip) are not transports any graft server uses and
  * are refused naming the supported set.
  *
  * One [[StreamServer]]/[[Conn]] pair abstracts the accept/connect
  * seam so a component's protocol code (h2c framing, spooling) is
  * transport-blind. TLS is a TCP-only feature here (the reference
  * likewise pairs configtls with the TCP listener; a unix socket's
  * access control is filesystem permissions) — unix + tls is refused
  * loudly rather than silently unencrypted. */
object ConfigNet {

  sealed trait Transport { def label: String }
  case object Tcp extends Transport { val label = "tcp" }
  final case class Unix(path: String) extends Transport { val label = "unix" }

  /** parse the config `transport` string; `unixPath` is consulted
    * (and required non-empty) only for unix */
  def parse(transport: String, unixPath: => String): Transport =
    transport.trim.toLowerCase match {
      case "" | "tcp" | "tcp4" | "tcp6" => Tcp
      case "unix" =>
        val p = unixPath
        require(p != null && p.nonEmpty,
          "transport unix needs a socket `path`")
        Unix(p)
      case other => throw new IllegalArgumentException(
        s"unsupported transport '$other' (tcp|tcp4|tcp6|unix)")
    }

  /** one accepted/connected stream, transport-blind */
  final class Conn(val in: InputStream, val out: OutputStream,
                   closeFn: () => Unit) {
    def close(): Unit = closeFn()
  }

  /** blocking accept loop surface over either transport */
  trait StreamServer {
    def accept(): Conn
    def close(): Unit
    /** the OS-assigned TCP port; -1 for a unix socket (its identity
      * is the path in [[describe]]) */
    def boundPort: Int
    def describe: String
  }

  /** listen on loopback TCP (optionally TLS-wrapped — the existing
    * configtls surface) or an AF_UNIX path (stale socket file from a
    * previous run removed first; the file is unlinked on close) */
  def listen(transport: Transport, port: Int,
             tls: Option[graft.sources.TlsConfig]): StreamServer =
    transport match {
      case Tcp =>
        val server: java.net.ServerSocket = tls match {
          case None => new java.net.ServerSocket(
            port, 50, java.net.InetAddress.getLoopbackAddress)
          case Some(cfg) =>
            val ss = cfg.sslContext().getServerSocketFactory
              .createServerSocket(port, 50,
                java.net.InetAddress.getLoopbackAddress)
              .asInstanceOf[javax.net.ssl.SSLServerSocket]
            ss.setSSLParameters(cfg.serverParameters(ss.getSSLParameters))
            ss
        }
        new StreamServer {
          def accept(): Conn = {
            val s = server.accept()
            new Conn(s.getInputStream, s.getOutputStream, () => s.close())
          }
          def close(): Unit = server.close()
          def boundPort: Int = server.getLocalPort
          def describe: String = s"tcp localhost:${server.getLocalPort}"
        }
      case Unix(path) =>
        require(tls.isEmpty,
          "transport unix does not take tls (a unix socket's access " +
            "control is filesystem permissions); use transport tcp for TLS")
        val p = java.nio.file.Path.of(path)
        java.nio.file.Files.deleteIfExists(p)
        val ch = java.nio.channels.ServerSocketChannel
          .open(java.net.StandardProtocolFamily.UNIX)
        ch.bind(java.net.UnixDomainSocketAddress.of(p), 50)
        new StreamServer {
          def accept(): Conn = {
            val c = ch.accept()
            new Conn(java.nio.channels.Channels.newInputStream(c),
              java.nio.channels.Channels.newOutputStream(c), () => c.close())
          }
          def close(): Unit = {
            ch.close()
            java.nio.file.Files.deleteIfExists(p)
          }
          def boundPort: Int = -1
          def describe: String = s"unix $path"
        }
    }

  /** client connect. TCP honors connect/read timeouts and the
    * configtls client surface; unix connects are local rendezvous
    * (no OS-level connect/read timeout on the channel API — a hung
    * local peer surfaces via the caller's own deadline, and TLS is
    * refused as on the listen side). */
  def connect(transport: Transport, host: String, port: Int,
              connectTimeoutMs: Int, readTimeoutMs: Int,
              tls: Option[graft.sources.TlsConfig]): Conn =
    transport match {
      case Tcp =>
        val sock = tls match {
          case None =>
            val s = new java.net.Socket()
            s.connect(new java.net.InetSocketAddress(host, port),
              connectTimeoutMs)
            s
          case Some(cfg) => graft.sources.Tls.clientSocket(cfg, host, port)
        }
        sock.setSoTimeout(readTimeoutMs)
        new Conn(sock.getInputStream, sock.getOutputStream, () => sock.close())
      case Unix(path) =>
        require(tls.isEmpty,
          "transport unix does not take tls; use transport tcp for TLS")
        val ch = java.nio.channels.SocketChannel
          .open(java.net.UnixDomainSocketAddress.of(java.nio.file.Path.of(path)))
        new Conn(java.nio.channels.Channels.newInputStream(ch),
          java.nio.channels.Channels.newOutputStream(ch), () => ch.close())
    }
}
