package graft.util

import org.apache.hadoop.conf.Configuration

import java.io.{ObjectInputStream, ObjectOutputStream}

/** Serializable carrier for a Hadoop Configuration, so task closures can
  * use the *Spark session's* filesystem settings (credentials, defaultFS,
  * custom schemes) instead of a fresh default `new Configuration()`.
  * Hadoop's Configuration is not Serializable; it is write/readFields
  * round-tripped through Java serialization here — the standard Spark
  * pattern (spark-core ships the same shape as a private utility).
  */
final class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
