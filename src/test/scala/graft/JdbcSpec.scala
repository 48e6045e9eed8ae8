package graft

import java.util.Properties
import org.apache.spark.sql.functions._

/** read_sql_table equivalent (SURVEY.md §2.1): partitioned JDBC reads
  * against an embedded Derby database — `partitionColumn` splits the
  * table into parallel range queries, which is the only way a JDBC
  * source scales.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("partitioned JDBC round trip preserves data and parallelizes") {
    val customers = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_name", "c_acctbal")
    customers.write.mode("overwrite").jdbc(url, "CUST", new Properties())

    val maxKey = customers.agg(max("c_custkey")).as[Long].head()
    val back = spark.read.jdbc(url, "CUST",
      columnName = "c_custkey", lowerBound = 0L, upperBound = maxKey + 1,
      numPartitions = 4, connectionProperties = new Properties())

    assert(back.rdd.getNumPartitions == 4, "JDBC read not split into range partitions")
    val got = back.orderBy("c_custkey").as[(Long, String, Double)].collect().toSeq
    val expected = customers.orderBy("c_custkey").as[(Long, String, Double)].collect().toSeq
    assert(got == expected)
  }
}
