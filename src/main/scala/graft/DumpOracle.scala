// scratch: print oracleSql as JSON for macro-expansion diffing
package graft
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val m = SparkEntry.oracleSql.toSeq.sortBy(_._1)
    val json = m.map { case (k, v) =>
      "\"" + k + "\": " + org.json4s.jackson.JsonMethods.compact(org.json4s.JString(v))
    }.mkString("{", ", ", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(args(0)), json)
  }
}
