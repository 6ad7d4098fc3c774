package graft.sources

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper for a Hadoop `Configuration` (which is
  * Writable but not Serializable), so file-writing closures can carry
  * the SESSION's Hadoop conf — `spark.hadoop.*` settings (object-store
  * credentials, defaultFS overrides) — to the executors instead of
  * resolving filesystems from a blank `new Configuration()`.
  * Same shape as Spark's internal SerializableConfiguration. */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
