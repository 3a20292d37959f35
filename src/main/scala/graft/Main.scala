package graft

import org.apache.spark.sql.SparkSession
import graft.engine.Engine

/** CLI + interactive SQL REPL — the Spark analogue of the reference's
  * driver (reference: src/main.rs:11-78):
  *
  *  - one-shot mode: `Main "<sql>" [-l <types_len>]` runs a single query
  *    and prints wall-clock timing (src/main.rs:36-43);
  *  - no args: interactive SQL REPL. On a real terminal it is
  *    JLine-backed with arrow-key history recall persisted to
  *    `.history.txt` — parity with the reference's rustyline editor and
  *    history file (src/main.rs:31-34); on piped stdin (specs, driver
  *    smoke) it falls back to a plain line loop with the same contract.
  *    `q`/`exit`/`quit` to leave, per-query `Total execution time`
  *    (src/main.rs:45-78). Planning errors print and the loop continues
  *    (src/main.rs:56-59).
  */
object Main {

  def main(args: Array[String]): Unit = {
    var sql: Option[String] = None
    var len = 1024L // reference default (src/main.rs:16-17)
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-l" | "--len" | "--types-table-length" =>
          if (i + 1 >= args.length) {
            System.err.println(s"error: ${args(i)} requires a value"); sys.exit(2)
          }
          len = try args(i + 1).toLong
          catch {
            case _: NumberFormatException =>
              System.err.println(s"error: ${args(i)} expects a number, got '${args(i + 1)}'")
              sys.exit(2)
          }
          i += 2
        case s => sql = Some(s); i += 1
      }
    }
    val spark = Engine.build(Engine.Options(typesTableLength = len))
    sql match {
      case Some(q) =>
        // one-shot SQL also lands in history (reference: src/main.rs:38)
        try java.nio.file.Files.writeString(
          historyPath, q + "\n",
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
        catch { case _: java.io.IOException => }
        runOne(spark, q)
      case None => repl(spark)
    }
    spark.stop()
  }

  private def runOne(spark: SparkSession, sql: String): Unit = {
    val t0 = System.nanoTime()
    try {
      // EXPLAIN ANALYZE parity: DataFusion executes the plan and prints
      // per-operator metrics; Spark SQL has no such statement, so
      // intercept it here and route through Explain.analyze
      val analyzePrefix = "(?is)^\\s*EXPLAIN\\s+ANALYZE\\s+(.*)$".r
      sql match {
        case analyzePrefix(inner) => Explain.analyze(spark.sql(inner)).show(200, truncate = false)
        case _ => spark.sql(sql).show(20, truncate = false)
      }
      println(f"Total execution time: ${(System.nanoTime() - t0) / 1e3}%.0fµs")
    } catch {
      case e: Exception => println(e.getMessage)
    }
  }

  private val historyPath = java.nio.file.Paths.get(".history.txt")

  /** True only when stdin is a real terminal. `System.console() != null`
    * alone breaks on JDK 22+ (JLine-backed java.io.Console exists even
    * with redirected stdin); `Console.isTerminal` is the JDK 22+ check,
    * absent on 17 — probe it reflectively. */
  private def stdinIsTty: Boolean = {
    val c = System.console()
    c != null && (try c.getClass.getMethod("isTerminal").invoke(c)
      .asInstanceOf[Boolean]
    catch { case _: ReflectiveOperationException => true })
  }

  private def repl(spark: SparkSession): Unit =
    if (stdinIsTty) replJline(spark) else replPlain(spark)

  /** Interactive path: JLine line editor (bundled with Spark's jars) —
    * up/down recalls history across sessions from `.history.txt`, the
    * same file and semantics as the reference's rustyline REPL
    * (src/main.rs:31-34, 76-77). */
  private def replJline(spark: SparkSession): Unit = {
    import org.jline.reader.{EndOfFileException, LineReader, LineReaderBuilder, UserInterruptException}
    import org.jline.terminal.TerminalBuilder
    val terminal = TerminalBuilder.builder().system(true).build()
    val reader = LineReaderBuilder.builder()
      .terminal(terminal)
      .variable(LineReader.HISTORY_FILE, historyPath)
      // plain-line history format: rustyline's (and replPlain's) files
      // are untimestamped, and JLine's timestamped default REJECTS plain
      // lines at load ("bad history file syntax" → empty history)
      .option(LineReader.Option.HISTORY_TIMESTAMPED, false)
      .build()
    try {
      while (true) {
        // reference exits on both (src/main.rs:67-75)
        val line =
          try reader.readLine(">> ")
          catch {
            case _: EndOfFileException => println("CTRL-D"); return
            case _: UserInterruptException => println("CTRL-C"); return
          }
        val trimmed = line.trim
        if (Set("q", "exit", "quit").contains(trimmed)) return
        if (trimmed.nonEmpty) {
          try reader.getHistory.save()
          catch { case _: java.io.IOException => } // history is best-effort
          runOne(spark, trimmed)
        }
      }
    } finally terminal.close()
  }

  /** Piped-stdin path (specs, driver smoke): plain line loop, history
    * appended to the same file. */
  private def replPlain(spark: SparkSession): Unit = {
    var line: String = null
    print(">> ")
    while ({ line = scala.io.StdIn.readLine(); line != null }) {
      val trimmed = line.trim
      if (Set("q", "exit", "quit").contains(trimmed)) return
      if (trimmed.nonEmpty) {
        java.nio.file.Files.writeString(
          historyPath, trimmed + "\n",
          java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
        runOne(spark, trimmed)
      }
      print(">> ")
    }
  }
}
