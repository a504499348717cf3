from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("pg_vectorize_spark-tests")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def products_df(spark):
    """The reference's 40-product fixture, abbreviated: a deterministic corpus
    with the same shape (FIXTURES.md §1) for search/filter tests."""
    rows = [
        (1, "Pencil", "Wooden pencil with eraser", "office", 1.50),
        (2, "Notebook", "College ruled spiral notebook", "office", 3.75),
        (3, "Desk Lamp", "LED desk lamp with adjustable arm", "home", 24.99),
        (4, "Phone Charger", "Fast usb phone charger for mobile devices", "electronics", 12.99),
        (5, "Tablet Holder", "Adjustable tablet holder stand for mobile devices", "electronics", 18.50),
        (6, "Bluetooth Speaker", "Portable bluetooth speaker for mobile devices", "electronics", 45.00),
        (7, "Wireless Mouse", "Ergonomic wireless mouse", "electronics", 25.00),
        (8, "Alarm Clock", "Digital alarm clock with radio", "electronics", 25.00),
        (9, "Water Bottle", "Insulated steel water bottle", "kitchen", 15.25),
        (10, "Coffee Mug", "Ceramic coffee mug", "kitchen", 8.00),
        (11, "Backpack", "Water resistant laptop backpack", "travel", 55.00),
        (12, "Luggage Tag", "Leather luggage tag", "travel", 6.99),
        (13, "Pizza Cutter", "Stainless pizza cutter wheel", "kitchen", 9.99),
        (14, "Airplane Model", "Diecast airplane model kit", "toys", 32.00),
    ]
    return spark.createDataFrame(
        rows,
        "product_id int, product_name string, description string, "
        "product_category string, price double",
    )
