package graft.tools

import graft.streaming.{IrcLinesPartition, LineOffset, TwitchIrcMicroBatchStream}

import java.io.PrintWriter
import java.net.ServerSocket

/** Scratch experiment main (not part of the library surface): raw
  * ingest throughput of the `twitch-irc` DSv2 source path — fake local
  * server pushes N PRIVMSG lines, we drive the MicroBatchStream API
  * directly (latestOffset → planInputPartitions → reader → commit) and
  * report lines/s, with the memory tier unbounded vs capped (disk-spill
  * overflow). Quantifies that the source is not the topology bottleneck
  * (StreamBench's ~39k lines/s end-to-end vs this raw path).
  * Run: `sbt "runMain graft.tools.IrcSourceBench [nLines]"`.
  */
object IrcSourceBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500000)
    for ((label, cap) <- Seq(("unbounded", 0L), ("cap50k+spill", 50000L))) {
      val server = new ServerSocket(0)
      val t = new Thread(() => {
        val s = server.accept()
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(s.getInputStream))
        in.readLine(); in.readLine(); in.readLine()
        val out = new PrintWriter(new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(s.getOutputStream), 1 << 16))
        var i = 0
        while (i < n) {
          out.println(s":u$i!u@h PRIVMSG #c :message payload number $i lorem ipsum")
          i += 1
        }
        out.flush()
        Thread.sleep(60000)
      })
      t.setDaemon(true)
      t.start()

      val stream = new TwitchIrcMicroBatchStream(
        "127.0.0.1", server.getLocalPort, "#c", "nick", "oauth:x",
        maxBufferedLines = cap)
      val t0 = System.nanoTime()
      var got = 0L
      var start = LineOffset(0L)
      val factory = stream.createReaderFactory()
      while (got < n) {
        val end = stream.latestOffset(start, stream.getDefaultReadLimit)
          .asInstanceOf[LineOffset]
        if (end.n > start.n) {
          stream.planInputPartitions(start, end).foreach { p =>
            val r = factory.createReader(p)
            while (r.next()) { r.get(); got += 1 }
          }
          stream.commit(end)
          start = end
        } else Thread.sleep(1)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"IRCBENCH $label: $n lines in $sec%.2f s = ${n / sec}%.0f lines/s")
      stream.stop()
      server.close()
    }
  }
}
