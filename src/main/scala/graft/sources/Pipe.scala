package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Hadoop Streaming re-expressed: pipe rows through an external
  * executable, one line per record (ref: src/contrib/streaming/src/
  * java/org/apache/hadoop/streaming/PipeMapper.java:1,
  * PipeReducer.java:1). The process runs once per partition — the
  * same fan-out as the reference's one-process-per-task — so it
  * scales with the partition count, not the row count.
  */
object Pipe {

  /** Pipe a single-string-column DataFrame through `cmd` line-by-line. */
  def pipeLines(spark: SparkSession, lines: DataFrame, cmd: Seq[String]): DataFrame = {
    import spark.implicits._
    val piped = lines.as[String].rdd.pipe(cmd)
    spark.createDataset(piped).toDF("line")
  }

  /** Reduce-side pipe (ref: src/contrib/streaming/src/java/org/apache/
    * hadoop/streaming/PipeReducer.java:38): the reference feeds a
    * reducer script the SORTED, KEY-GROUPED record stream on stdin —
    * all values of one key arrive consecutively. Re-expressed: shuffle
    * on the key (every key lands wholly in one partition), sort within
    * partitions (key first, then the remaining columns for a
    * deterministic value order), render `key<TAB>fields` lines and run
    * one external process per partition. A streaming user's reducer
    * scripts (awk/python aggregators that break on key change) run
    * unmodified; results are independent of the partition count because
    * keys never straddle partitions. */
  def pipeReduce(spark: SparkSession, kv: DataFrame, keyCol: String,
    cmd: Seq[String], partitions: Int = 32): DataFrame = {
    import spark.implicits._
    val fields = keyCol +: kv.columns.filterNot(_ == keyCol).toSeq
    val grouped = kv.repartition(partitions, col(keyCol))
      .sortWithinPartitions(fields.map(col): _*)
    val piped = grouped
      .select(concat_ws("\t", fields.map(c => col(c).cast("string")): _*).as("line"))
      .as[String].rdd.pipe(cmd)
    spark.createDataset(piped).toDF("line")
  }

  /** Binary record framing for external pipes (ref: src/contrib/
    * streaming/src/java/org/apache/hadoop/typedbytes/TypedBytesInput
    * .java:1, TypedBytesOutput.java:1 — the streaming contrib's binary
    * protocol that lets non-Java programs process non-textual records).
    * Frame = 1-byte type code 0 (BYTES, matching typed-bytes) +
    * 4-byte big-endian length + payload. Line-oriented `RDD.pipe`
    * corrupts payloads containing \n or \0; this path is 8-bit clean.
    *
    * One process per partition, stdin fed from a daemon thread while
    * the task thread consumes framed stdout — the same two-thread
    * shape as the reference's PipeMapper, so a slow consumer never
    * deadlocks against a full stdin buffer. A non-zero exit fails the
    * task (and Spark's retry re-runs the whole partition, which is
    * safe because the process is stateless per partition).
    */
  def pipeBinary(spark: SparkSession, bin: DataFrame, cmd: Seq[String]): DataFrame = {
    import spark.implicits._
    val piped = bin.select(col(bin.columns.head)).as[Array[Byte]]
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          import java.io._
          val proc = new ProcessBuilder(cmd: _*)
            .redirectError(ProcessBuilder.Redirect.INHERIT).start()
          // The task, not the iterator, owns the process lifetime: a
          // malformed frame throws out of fetch(), and a `limit` can
          // abandon the iterator half-consumed — either way the task
          // completes and this reaps the child (Spark's own PipedRDD
          // registers the same hook). Normal EOF has already waitFor'd;
          // destroying an exited process is a no-op.
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit] { _ =>
              if (proc.isAlive) proc.destroyForcibly()
              ()
            })
          val stdin = new DataOutputStream(
            new BufferedOutputStream(proc.getOutputStream, 64 * 1024))
          val writer = new Thread(() => {
            try {
              it.foreach { b =>
                stdin.writeByte(0); stdin.writeInt(b.length); stdin.write(b)
              }
              stdin.close()
            } catch { case _: IOException => () } // consumer died; exit code tells
          }, "graft-pipe-stdin")
          writer.setDaemon(true)
          writer.start()
          val stdout = new DataInputStream(
            new BufferedInputStream(proc.getInputStream, 64 * 1024))
          new Iterator[Array[Byte]] {
            private var nextRec: Array[Byte] = fetch()
            private def fetch(): Array[Byte] = {
              val code = stdout.read()
              if (code < 0) {
                writer.join()
                val rc = proc.waitFor()
                if (rc != 0) throw new IOException(
                  s"pipeBinary: ${cmd.head} exited with $rc")
                null
              } else {
                require(code == 0, s"pipeBinary: unknown type code $code")
                val len = stdout.readInt()
                require(len >= 0, s"pipeBinary: negative frame length $len")
                val buf = new Array[Byte](len)
                stdout.readFully(buf)
                buf
              }
            }
            def hasNext: Boolean = nextRec != null
            def next(): Array[Byte] = {
              val r = nextRec; nextRec = fetch(); r
            }
          }
        }
      }
    piped.toDF("payload")
  }

  /** Demo/oracle query: document texts as raw UTF-8 payloads through a
    * binary-clean identity pipe (`cat`), content-hashed back — proves
    * the framing is 8-bit transparent end-to-end under the gate (the
    * oracle hashes the same bytes straight off the table). */
  def pipeBinaryHash(spark: SparkSession, dir: String): DataFrame = {
    val payloads = Tables.documents(spark, dir)
      .select(col("text").cast("binary").as("payload"))
    pipeBinary(spark, payloads, Seq("cat"))
      .select(md5(col("payload")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("n"))
  }

  /** Demo/oracle query: per-flag quantity totals computed by an
    * EXTERNAL awk reducer that relies on the key-grouped stream —
    * quantities pre-cast to bigint so the awk sum stays exact-integer
    * and engine-portable. */
  def pipeReduceSum(spark: SparkSession, dir: String): DataFrame = {
    val kv = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("k"),
        col("l_quantity").cast("bigint").as("v"))
    val prog =
      "BEGIN{FS=OFS=\"\\t\"} k!=$1&&NR>1{print k,s;s=0} {k=$1;s+=$2} END{if(NR>0)print k,s}"
    pipeReduce(spark, kv, "k", Seq("awk", prog))
      .select(split(col("line"), "\t").as("f"))
      .select(expr("f[0]").as("l_returnflag"),
        expr("cast(f[1] as bigint)").as("sum_qty"))
  }

  /** Demo/oracle query: uppercase documents through `tr` and parse the
    * TSV back. The text is pre-cleaned to printable ASCII so the
    * external tool and the SQL oracle (upper()) agree exactly. */
  def pipeUpper(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables.documents(spark, dir).select(
      concat(col("doc_id").cast("string"), lit("\t"),
        expr("substring(regexp_replace(text, '[^ -~]', ''), 1, 60)")).as("line"))
    pipeLines(spark, lines, Seq("tr", "[:lower:]", "[:upper:]"))
      .select(split(col("line"), "\t").as("f"))
      .select(expr("cast(f[0] as bigint)").as("doc_id"),
        expr("coalesce(f[1], '')").as("up"))
  }
}
