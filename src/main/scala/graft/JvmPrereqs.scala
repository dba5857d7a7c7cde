package graft

/** Fail-fast JDK-17 module-access check for JVMs launched OUTSIDE
  * spark-submit (bare `java -cp`, ad-hoc runners).
  *
  * Spark's launcher injects `JavaModuleOptions` (--add-opens for
  * java.nio et al.); sbt runs get them from build.sbt's `javaOptions`.
  * A bare `java -cp` without them runs FINE for hours — until memory
  * pressure first drops a primitive-classtag cached block to disk:
  * `SerializerManager` auto-picks Kryo there, `KryoSerializer.newKryo`
  * registers `ByteBuffer.allocate(1).getClass`, and FieldSerializer's
  * reflective field walk dies on
  * `InaccessibleObjectException: module java.base does not "opens
  * java.nio"` — task failure deep inside an otherwise-healthy run (the
  * round-10 sf100 probe died exactly this way at minute 12,
  * /tmp/bench_sf100_r10b/bench.log). Probing the same reflective access
  * at startup converts that latent bomb into an immediate, explained
  * abort.
  */
object JvmPrereqs {

  /** The openings a graft JVM needs; mirrors
    * org.apache.spark.launcher.JavaModuleOptions (public Spark source)
    * restricted to the ones our code paths exercise.
    */
  val RequiredOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")

  /** Abort (exit 2) with a copy-pasteable flag list if the module
    * openings Kryo block-spill serialization needs are missing.
    */
  def check(): Unit = {
    val probe = java.nio.ByteBuffer.allocate(1) // HeapByteBuffer
    val accessible = try {
      val f = classOf[java.nio.ByteBuffer].getDeclaredField("hb")
      f.trySetAccessible()
    } catch { case _: NoSuchFieldException => true } // exotic JDK: skip
    if (!accessible) {
      System.err.println(
        "[graft] FATAL: this JVM lacks the JDK-17 --add-opens flags " +
          "Spark needs. Cached-block spills will Kryo-fail mid-run " +
          "(java.nio.HeapByteBuffer InaccessibleObjectException). " +
          "Relaunch with:\n" +
          RequiredOpens.map(p => s"  --add-opens=$p=ALL-UNNAMED")
            .mkString("\n"))
      sys.exit(2)
    }
    val _ = probe
  }
}
