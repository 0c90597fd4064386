package graft.pipeline

import java.io.{InputStream, OutputStream}

/** config/confignet analog: the `transport` knob on socket endpoints
  * (confignet.go NetAddr.Transport). graft's stream components speak
  * two of the reference's stream transports: `tcp` (with the
  * tcp4/tcp6 aliases — graft binds loopback, where the distinction
  * is moot) and `unix` (an AF_UNIX stream socket at a filesystem
  * path, via java.net.UnixDomainSocketAddress — JDK 16+). The
  * DATAGRAM shapes (udp/udp4/udp6/unixgram) are a separate seam —
  * [[DatagramServer]], consumed by the udp_lines receiver (the
  * syslog/statsd-shaped ingest) — and each parse refuses the other
  * family's shapes naming where they belong.
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
      case d @ ("udp" | "udp4" | "udp6" | "unixgram") =>
        throw new IllegalArgumentException(
          s"transport '$d' is a datagram shape; stream endpoints take " +
            "tcp|tcp4|tcp6|unix (datagram ingest is the udp_lines receiver)")
      case other => throw new IllegalArgumentException(
        s"unsupported transport '$other' (tcp|tcp4|tcp6|unix)")
    }

  // ── datagram shapes (confignet.go udp/udp4/udp6/unixgram) ──

  sealed trait DatagramTransport { def label: String }
  case object Udp extends DatagramTransport { val label = "udp" }
  final case class Unixgram(path: String) extends DatagramTransport {
    val label = "unixgram"
  }

  /** parse the `transport` string of a DATAGRAM endpoint; `unixPath`
    * is consulted (and required non-empty) only for unixgram */
  def parseDatagram(transport: String, unixPath: => String): DatagramTransport =
    transport.trim.toLowerCase match {
      case "" | "udp" | "udp4" | "udp6" => Udp
      case "unixgram" =>
        val p = unixPath
        require(p != null && p.nonEmpty,
          "transport unixgram needs a socket `path`")
        Unixgram(p)
      case s @ ("tcp" | "tcp4" | "tcp6" | "unix") =>
        throw new IllegalArgumentException(
          s"transport '$s' is a stream shape; datagram endpoints take " +
            "udp|udp4|udp6|unixgram")
      case other => throw new IllegalArgumentException(
        s"unsupported transport '$other' (udp|udp4|udp6|unixgram)")
    }

  /** blocking one-datagram-at-a-time receive surface; [[close]]
    * unblocks a pending receive (it surfaces as an exception the
    * caller's shutdown flag classifies) */
  trait DatagramServer {
    /** block for one datagram into `buf`; returns its payload length */
    def receive(buf: Array[Byte]): Int
    def close(): Unit
    /** OS-assigned UDP port; -1 for unixgram (identity = the path) */
    def boundPort: Int
    def describe: String
  }

  /** bind a datagram listener: UDP on loopback (port 0 = ephemeral)
    * or an AF_UNIX datagram socket. This JDK's channel layer may not
    * support the UNIX protocol family for datagrams (JEP 380 covered
    * stream sockets) — an unsupported unixgram is refused LOUDLY at
    * bind, pointing at udp, never silently downgraded. */
  def listenDatagram(transport: DatagramTransport, port: Int): DatagramServer =
    transport match {
      case Udp =>
        val sock = new java.net.DatagramSocket(port,
          java.net.InetAddress.getLoopbackAddress)
        new DatagramServer {
          def receive(buf: Array[Byte]): Int = {
            val p = new java.net.DatagramPacket(buf, buf.length)
            sock.receive(p)
            p.getLength
          }
          def close(): Unit = sock.close()
          def boundPort: Int = sock.getLocalPort
          def describe: String = s"udp localhost:${sock.getLocalPort}"
        }
      case Unixgram(path) =>
        val ch = openUnixDatagram(path)
        val p = java.nio.file.Path.of(path)
        java.nio.file.Files.deleteIfExists(p) // stale socket replace
        ch.bind(java.net.UnixDomainSocketAddress.of(p))
        new DatagramServer {
          def receive(buf: Array[Byte]): Int = {
            val bb = java.nio.ByteBuffer.wrap(buf)
            ch.receive(bb)
            bb.position()
          }
          def close(): Unit = {
            ch.close()
            java.nio.file.Files.deleteIfExists(p)
          }
          def boundPort: Int = -1
          def describe: String = s"unixgram $path"
        }
    }

  /** send one datagram (the spec harness + the client half of the
    * seam; fire-and-forget — datagrams carry no delivery contract) */
  def sendDatagram(transport: DatagramTransport, port: Int,
                   payload: Array[Byte]): Unit = transport match {
    case Udp =>
      val s = new java.net.DatagramSocket()
      try s.send(new java.net.DatagramPacket(payload, payload.length,
        java.net.InetAddress.getLoopbackAddress, port))
      finally s.close()
    case Unixgram(path) =>
      val ch = openUnixDatagram(path)
      try {
        ch.connect(java.net.UnixDomainSocketAddress.of(
          java.nio.file.Path.of(path)))
        ch.write(java.nio.ByteBuffer.wrap(payload))
        ()
      } finally ch.close()
  }

  private def openUnixDatagram(path: String): java.nio.channels.DatagramChannel =
    try java.nio.channels.DatagramChannel.open(
      java.net.StandardProtocolFamily.UNIX)
    catch {
      case _: UnsupportedOperationException =>
        throw new IllegalArgumentException(
          "transport unixgram: this JDK/platform does not support " +
            "AF_UNIX datagram channels; use transport udp")
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

  /** shared deadline timer for unix-channel I/O (daemon; one thread
    * serves every connection — tasks only close channels). Cancelled
    * tasks leave the queue immediately (every successful read cancels
    * one; the default policy would hold each until its full delay). */
  private lazy val watchdog = {
    val ex = new java.util.concurrent.ScheduledThreadPoolExecutor(1,
      new java.util.concurrent.ThreadFactory {
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, "confignet-watchdog"); t.setDaemon(true); t
        }
      })
    ex.setRemoveOnCancelPolicy(true)
    ex
  }

  /** client connect. TCP honors connect/read timeouts and the
    * configtls client surface. Unix connects are local rendezvous
    * (immediate — no connect timeout to honor), but the I/O deadline
    * is enforced on BOTH stream directions: the channel API has no
    * SO_TIMEOUT, so each read — and each write/flush, since a peer
    * that stops READING wedges a writer once the socket buffer fills
    * — arms a watchdog that closes the channel at `readTimeoutMs`
    * and surfaces a SocketTimeoutException, like the TCP path.
    * `readTimeoutMs <= 0` disables the deadline (setSoTimeout(0)
    * semantics). Once a deadline fires the channel is gone (a closed
    * channel cannot be resurrected the way an SO_TIMEOUT socket
    * stays usable) — every later call reports the timeout, not a
    * bare ClosedChannelException. TLS is refused as on the listen
    * side. */
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
        sock.setSoTimeout(math.max(0, readTimeoutMs))
        new Conn(sock.getInputStream, sock.getOutputStream, () => sock.close())
      case Unix(path) =>
        require(tls.isEmpty,
          "transport unix does not take tls; use transport tcp for TLS")
        val ch = java.nio.channels.SocketChannel
          .open(java.net.UnixDomainSocketAddress.of(java.nio.file.Path.of(path)))
        val raw = java.nio.channels.Channels.newInputStream(ch)
        val rawOut = java.nio.channels.Channels.newOutputStream(ch)
        if (readTimeoutMs <= 0)
          new Conn(raw, rawOut, () => ch.close())
        else {
          // `fired` is set BEFORE the close so the unblocked I/O call
          // (which may observe the AsynchronousCloseException while
          // run() is still inside close() — task.isDone would race)
          // always classifies the failure as a timeout
          val deadline = new Object {
            @volatile var fired = false
            def timed[A](f: => A): A = {
              if (fired) throw new java.net.SocketTimeoutException(
                s"unix $path: I/O timed out after $readTimeoutMs ms")
              val task = watchdog.schedule(new Runnable {
                def run(): Unit = {
                  fired = true
                  try ch.close()
                  catch { case _: java.io.IOException => () }
                }
              }, readTimeoutMs.toLong,
                java.util.concurrent.TimeUnit.MILLISECONDS)
              try f
              catch {
                // AsynchronousCloseException extends it — one case
                case _: java.nio.channels.ClosedChannelException if fired =>
                  throw new java.net.SocketTimeoutException(
                    s"unix $path: I/O timed out after $readTimeoutMs ms")
              } finally task.cancel(false)
            }
          }
          val timedIn = new java.io.InputStream {
            override def read(): Int = deadline.timed(raw.read())
            override def read(b: Array[Byte], off: Int, len: Int): Int =
              deadline.timed(raw.read(b, off, len))
            override def close(): Unit = ch.close()
          }
          val timedOut = new java.io.OutputStream {
            override def write(b: Int): Unit = deadline.timed(rawOut.write(b))
            override def write(b: Array[Byte], off: Int, len: Int): Unit =
              deadline.timed(rawOut.write(b, off, len))
            override def flush(): Unit = deadline.timed(rawOut.flush())
            override def close(): Unit = ch.close()
          }
          // buffer OUTSIDE the deadline wrappers: a byte-at-a-time
          // caller hits the buffer, and only refills/drains/flushes
          // pay the schedule+cancel round-trip (one watchdog task per
          // LOGICAL transfer, not per byte). Close still reaches the
          // channel through the wrapped streams.
          new Conn(new java.io.BufferedInputStream(timedIn),
            new java.io.BufferedOutputStream(timedOut), () => ch.close())
        }
    }
}
