package graft.model

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed `Dataset[T]` face of the canonical entities (SURVEY.md §1.4:
  * case classes where type safety helps — compile-checked field access
  * for library users; the `DataFrame` face stays primary for
  * dynamic-schema flows).
  *
  * Encoders are product encoders over the canonical columns; dates are
  * surfaced as `java.sql.Date` (the fixture's ship timestamp carries no
  * meaningful intra-day component). */
object Typed {

  final case class Supplier(SUPPLIER_ID: Long, SUPPLIER_NAME: String)

  final case class Product(PRODUCT_ID: Long, PRODUCT_NAME: String,
                           CATEGORY: String, SELLING_PRICE: Double,
                           COST_PRICE: Double, STOCK_QUANTITY: Int,
                           REORDER_LEVEL: Int, SUPPLIER_ID: Long)

  final case class Customer(CUSTOMER_ID: Long, NAME: String, CITY: String)

  final case class Sale(SALE_ID: Long, CUSTOMER_ID: Long, PRODUCT_ID: Long,
                        SHIP_SUPPLIER_ID: Long, SALE_DATE: java.sql.Date,
                        QUANTITY: Double, DISCOUNT: Double,
                        ORDER_STATUS: String)

  def suppliers(spark: SparkSession, dir: String): Dataset[Supplier] = {
    import spark.implicits._
    Entities.suppliers(spark, dir).as[Supplier]
  }

  def products(spark: SparkSession, dir: String): Dataset[Product] = {
    import spark.implicits._
    Entities.products(spark, dir)
      .withColumn("STOCK_QUANTITY", col("STOCK_QUANTITY").cast("int"))
      .withColumn("REORDER_LEVEL", col("REORDER_LEVEL").cast("int"))
      .as[Product]
  }

  def customers(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._
    Entities.customers(spark, dir).as[Customer]
  }

  def sales(spark: SparkSession, dir: String): Dataset[Sale] = {
    import spark.implicits._
    Entities.sales(spark, dir)
      .withColumn("SALE_DATE", col("SALE_DATE").cast("date"))
      .as[Sale]
  }
}
